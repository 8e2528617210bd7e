"""Operator-parity query modules. Importing this package registers
every query into advisorydatapipeline_spark.registry."""
