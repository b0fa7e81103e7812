"""avro_spark.streaming"""
