from advisorydatapipeline_spark.sources.io import (  # noqa: F401
    conform,
    empty_df,
    read_table,
    write_table,
)
