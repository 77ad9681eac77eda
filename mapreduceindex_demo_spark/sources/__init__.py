from mapreduceindex_demo_spark.sources.readers import (  # noqa: F401
    read_source,
    write_sink,
)
