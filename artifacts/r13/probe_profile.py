import sys, time
sys.path.insert(0, "/root/repo")
from es_household_retention_spark_job_spark.session import get_spark
from es_household_retention_spark_job_spark.sources.tpch import load_table
from es_household_retention_spark_job_spark.operators import dedup as D
from pyspark.sql import functions as F

spark = get_spark(app_name="probe_profile", cpus=32, shuffle_partitions=64)
sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
docs = load_table(spark, sf_dir, "documents")
import tempfile, os
root = tempfile.mkdtemp(prefix="probe_prof_")
idx_path = os.path.join(root, "idx")
t0=time.perf_counter()
D.build_neardup_index(docs.where(F.col("doc_id")%2==0), idx_path)
print("build:", round(time.perf_counter()-t0,2))
idx = D.read_neardup_index(spark, idx_path)
for rep in range(3):
    t0=time.perf_counter()
    out = D.neardup_probe(docs.where(F.col("doc_id")%2==1), idx)
    out.write.format("noop").mode("overwrite").save()
    print("probe rep", rep, round(time.perf_counter()-t0,2))
# phase timing: shingle pass alone
t0=time.perf_counter()
D.shingle_sets(docs.where(F.col("doc_id")%2==1)).write.format("noop").mode("overwrite").save()
print("one shingle pass:", round(time.perf_counter()-t0,2))
t0=time.perf_counter()
D.neardup_index_frame(docs.where(F.col("doc_id")%2==1)).write.format("noop").mode("overwrite").save()
print("one band frame pass:", round(time.perf_counter()-t0,2))
spark.stop()
