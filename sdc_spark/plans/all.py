"""Import every plan module so the registry is fully populated."""

import sdc_spark.plans.coverage2  # noqa: F401
import sdc_spark.plans.curation2  # noqa: F401
import sdc_spark.plans.extended  # noqa: F401
import sdc_spark.plans.frame_expr  # noqa: F401
import sdc_spark.plans.graph_q  # noqa: F401
import sdc_spark.plans.groupby  # noqa: F401
import sdc_spark.plans.joins  # noqa: F401
import sdc_spark.plans.llm_data  # noqa: F401
import sdc_spark.plans.llm_data2  # noqa: F401
import sdc_spark.plans.llm_data3  # noqa: F401
import sdc_spark.plans.llm_data4  # noqa: F401
import sdc_spark.plans.llm_data5  # noqa: F401
import sdc_spark.plans.ml_q  # noqa: F401
import sdc_spark.plans.relational  # noqa: F401
import sdc_spark.plans.pipeline_release  # noqa: F401
import sdc_spark.plans.retrieval_q  # noqa: F401
import sdc_spark.plans.relational2  # noqa: F401
import sdc_spark.plans.relational3  # noqa: F401
import sdc_spark.plans.scalar  # noqa: F401
import sdc_spark.plans.series_api  # noqa: F401
import sdc_spark.plans.sources2  # noqa: F401
import sdc_spark.plans.streaming_q  # noqa: F401
import sdc_spark.plans.timeseries2  # noqa: F401
import sdc_spark.plans.tpch_like  # noqa: F401
import sdc_spark.plans.tpch_more  # noqa: F401
import sdc_spark.plans.window  # noqa: F401
from sdc_spark.plans import tpch_final, tpch_wide  # noqa: F401
