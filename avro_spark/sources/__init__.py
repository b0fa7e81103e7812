"""avro_spark.sources"""
