from mo_etl_spark.functions.numeric import cents, money, stable_avg, stable_sum_money

__all__ = ["cents", "money", "stable_avg", "stable_sum_money"]
