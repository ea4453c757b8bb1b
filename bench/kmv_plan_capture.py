"""Capture the kmv_sketch INTERNAL plan (the sketch runs eagerly behind a
localCheckpoint, so the query's returned plan is just the checkpoint scan).
Monkeypatch localCheckpoint to a no-op so the full lineage shows, then
explain the sketch frame the real operator builds."""
import sys, os
sys.path.insert(0, '/root/repo')
from pyspark.sql import DataFrame, functions as F
from datatools_spark.session import get_spark

out_path = sys.argv[1]
spark = get_spark("kmv-plan-capture")
spark.sparkContext.setLogLevel("ERROR")

from pyspark.sql.classic.dataframe import DataFrame as CDF
orig = CDF.localCheckpoint
CDF.localCheckpoint = lambda self, eager=True: self  # keep lineage visible

from datatools_spark.queries import _t
from datatools_spark.operators import sketches as SK, text as TX
from datatools_spark.operators import partitioning as PT

d = _t(spark, "/root/testdata/sf0.1", "documents")
tok = (PT.ensure_parallelism(d.select("source", "text"), min_bytes=0)
       .select("source", F.explode(TX.words_col("text")).alias("w")))
sk = SK.kmv_sketch(tok, ["source"], "w", k=64, include_ndv=True)
plan = sk._sc._jvm.PythonSQLUtils.explainString(sk._jdf.queryExecution(), "formatted")
with open(out_path, "w") as f:
    f.write(plan)
# restore on the SAME class that was patched (r11 ADVICE: restoring
# onto the pyspark.sql.DataFrame base left the no-op installed on the
# classic class for the rest of the process)
CDF.localCheckpoint = orig
print("wrote", out_path)
spark.stop()
