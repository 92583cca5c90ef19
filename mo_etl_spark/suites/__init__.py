"""Importing this package populates the query registry (all suites)."""

import mo_etl_spark.suites.aggregates  # noqa: F401
import mo_etl_spark.suites.analytics  # noqa: F401
import mo_etl_spark.suites.jx_queries  # noqa: F401
import mo_etl_spark.suites.llm  # noqa: F401
import mo_etl_spark.suites.modern_sql  # noqa: F401
import mo_etl_spark.suites.relational  # noqa: F401
import mo_etl_spark.suites.scalars  # noqa: F401
import mo_etl_spark.suites.sources  # noqa: F401
import mo_etl_spark.suites.streaming_batch  # noqa: F401
import mo_etl_spark.suites.streaming_real  # noqa: F401
import mo_etl_spark.suites.windows  # noqa: F401
import mo_etl_spark.suites.tpch  # noqa: F401
import mo_etl_spark.suites.tpch_extra  # noqa: F401
import mo_etl_spark.suites.udfs  # noqa: F401
