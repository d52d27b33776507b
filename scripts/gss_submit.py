#!/usr/bin/env python
"""spark-submit entry script: the cluster-deployment form of the CLI.

    ./scripts/package.sh
    spark-submit --master <cluster> --py-files gazetteer_search_spark.zip \
        scripts/gss_submit.py build-index --source s3://corpus --out s3://idx

Identical arguments to ``python -m gazetteer_search_spark.cli``; the package
arrives on the executors via --py-files, the driver picks up spark-submit's
master/deploy-mode through SparkSession.getOrCreate.
"""
import sys

from gazetteer_search_spark.cli import main

if __name__ == "__main__":
    main(sys.argv[1:])
