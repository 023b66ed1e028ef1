"""Interleaved A/B: working-tree operators/similarity.py vs a git rev,
driving the two IVF queries through inline bodies that call the
respective operator module. Digest-compared, one JVM."""
import hashlib, json, subprocess, sys, tempfile, time, importlib.util
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from jubilant_garbanzo_spark.session import get_spark
from jubilant_garbanzo_spark.catalog import load_table
from jubilant_garbanzo_spark.operators import similarity as S_new

rev = sys.argv[1] if len(sys.argv) > 1 else "HEAD"
src = subprocess.run(["git", "-C", "/root/repo", "show",
                      f"{rev}:jubilant_garbanzo_spark/operators/similarity.py"],
                     check=True, capture_output=True, text=True).stdout
with tempfile.NamedTemporaryFile("w", suffix=".py", prefix="sim_old_", delete=False) as f:
    f.write(src); tmp = f.name
spec = importlib.util.spec_from_file_location("sim_old", tmp)
S_old = importlib.util.module_from_spec(spec); spec.loader.exec_module(S_old)

SF = "/root/testdata/sf0.1"
spark = get_spark("ab-sim")

def ivf(S):
    e = load_table(spark, SF, "embeddings")
    assigned, centroids = S.build_ivf_index(e)
    probes = []
    for qid in (0, 1):
        q = e.filter(F.col("vec_id") == qid).select(
            F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec"))
        probes.append(S.ivf_probe(assigned, centroids, q, k=10, n_probe=2)
                      .select(F.lit(qid).alias("q_id"), "vec_id", "cos_sim"))
    out = probes[0].unionAll(probes[1])
    return out, (assigned, centroids)

def ivfpq(S):
    e = load_table(spark, SF, "embeddings")
    return S.ivfpq_adc_topk(e), None

BODIES = {"embed_ann_ivf": ivf, "embed_ann_ivfpq": ivfpq}

def run(S, body):
    t0 = time.perf_counter()
    df, handles = body(S)
    df.write.format("noop").mode("overwrite").save()
    wall = time.perf_counter() - t0
    if handles:
        for h in handles: h.unpersist()
    return wall

def digest(S, body):
    df, handles = body(S)
    rows = df.collect()
    if handles:
        for h in handles: h.unpersist()
    canon = sorted(tuple(str(v) for v in r) for r in rows)
    return hashlib.md5(repr(canon).encode()).hexdigest()[:12], len(rows)

# warm-up
run(S_new, ivf)
out = {}
PAIRS = int(sys.argv[2]) if len(sys.argv) > 2 else 4
for name, body in BODIES.items():
    walls = {"old": [], "new": []}
    for _ in range(PAIRS):
        walls["old"].append(run(S_old, body))
        walls["new"].append(run(S_new, body))
    d_old, d_new = digest(S_old, body), digest(S_new, body)
    med = lambda xs: sorted(xs)[len(xs)//2]
    out[name] = {"old_walls": [round(w,3) for w in walls["old"]],
                 "new_walls": [round(w,3) for w in walls["new"]],
                 "speedup": round(med(walls["old"])/med(walls["new"]),3),
                 "identical": d_old == d_new, "rows": d_new[1]}
    print(f"# {name}: {out[name]['speedup']}x identical={d_old==d_new}", file=sys.stderr)
print(json.dumps(out, indent=1))
