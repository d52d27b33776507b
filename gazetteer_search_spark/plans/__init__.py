from gazetteer_search_spark.plans.inspect import (  # noqa: F401
    explain_str,
    assert_no_cartesian,
    assert_partition_pruned,
    assert_pushed_filters,
    uses_broadcast_join,
)
