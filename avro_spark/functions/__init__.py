"""avro_spark.functions"""
