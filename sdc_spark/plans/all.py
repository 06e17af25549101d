"""Import every plan module so the registry is fully populated."""

import sdc_spark.plans.relational  # noqa: F401
