"""Basic workflow on the sdc_spark facade — the sdc_spark spelling of the
reference's entry example (/root/reference/examples/basic_workflow.py:
read a CSV, take two columns, mean of one, sort the other). Where the
reference compiles the function with Numba for one node, here the same
pandas-shaped code plans onto Spark and runs identically on a laptop or a
1000-executor cluster.

Run:  python examples/basic_workflow.py [csv_path]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sdc_spark.frame.core import SparkFrame
from sdc_spark.session import get_spark
from sdc_spark.sources.readers import read_csv


def get_analyzed_data(spark, fname: str):
    df = SparkFrame(read_csv(spark, fname, header=True))
    mean_bonus = df["bonus_pct"].mean()
    sorted_names = df["first_name"].sort_values()
    return mean_bonus, sorted_names


def main() -> None:
    spark = get_spark("example_basic_workflow")
    fname = sys.argv[1] if len(sys.argv) > 1 else _write_demo_csv(spark)
    mean_bonus, sorted_first_names = get_analyzed_data(spark, fname)
    print(sorted_first_names.head(10).to_pandas())
    print("Average Bonus %:", mean_bonus)


def _write_demo_csv(spark) -> str:
    """Small employees-shaped demo input (the reference ships a CSV; we
    synthesize an equivalent so the example is self-contained)."""
    import pandas as pd

    path = "/tmp/sdc_spark_examples/employees"
    pdf = pd.DataFrame(
        {
            "first_name": ["Dennis", "Alice", "Carol", "Bob", "Eve"] * 4,
            "bonus_pct": [1.389, 2.5, 3.1, 0.75, 4.2] * 4,
        }
    )
    spark.createDataFrame(pdf).coalesce(1).write.mode("overwrite").option(
        "header", "true"
    ).csv(path)
    return path


if __name__ == "__main__":
    main()
