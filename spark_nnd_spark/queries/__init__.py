from spark_nnd_spark.queries.relational import RELATIONAL_QUERIES, RELATIONAL_ORACLES

__all__ = ["RELATIONAL_QUERIES", "RELATIONAL_ORACLES"]
