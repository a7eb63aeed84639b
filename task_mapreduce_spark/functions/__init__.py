from task_mapreduce_spark.functions.exact import davg, dsum, SUM_DEC, AVG_DEC

__all__ = ["davg", "dsum", "SUM_DEC", "AVG_DEC"]
