from mapreduceindex_demo_spark.operators.relational import (  # noqa: F401
    MONEY,
    RATE,
    asof_join,
    dec,
    dsum,
    davg,
    topk_per_group,
)
