"""avro_spark.operators"""
