"""Generate a 20x scale-up of the sf0.1 testdata into a many-file layout,
for the 8-vs-32-core scaling spot-bench (SCALE.md "Round-16 parallel-scaling
demonstration").  NOT driver testdata — written under /tmp, never read by the
oracle gate; timing-only.

Replication design (k = replica index 0..REP-1; replica 0 is the original):
  * region / nation: copied as-is (dimension tables do not scale with SF).
  * customer / supplier / part / orders / lineitem: every key column shifts
    by k * SHIFT so each replica is an internally-consistent star (joins
    land inside the replica); measures/dates unchanged, so per-key group
    sizes stay constant while key cardinality grows 20x.
  * documents: doc_id shifts; text is passed through a per-replica letter
    substitution (translate) so replicas are DISSIMILAR content — distinct
    contents and shingle vocabulary grow 20x (the generic-growth regime;
    the 20-way-duplication regime is the separate r15 collapse experiment).
  * embeddings: vec_id shifts; each element gets a deterministic
    per-(replica, id, dim) perturbation large enough to push cross-replica
    cosines below the 0.9 near-dup threshold — vector count grows 20x
    without clique inflation.  Replica 0 keeps vec_id 1..4 (pinned
    centroids).
  * events: event_id and user_id shift; with parent(u) = u - 8 the
    hierarchy forest deepens 20x (inherent to the id-derived chain rule),
    so the pointer-jump round budget grows by ~log2(20) ~ 4-5 rounds —
    the O(log depth) claim gets exercised rather than held constant.

Every table is written as N_FILES files so scans parallelize like a real
lake delivery (SCALE.md empirical-scale-up convention).

Usage: python tools/make_scaleup.py [out_dir] [REP]
"""
import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from service_alerts_connector_spark.session import get_spark

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scaleup/sf2.0"
REP = int(sys.argv[2]) if len(sys.argv) > 2 else 20
SRC = "/root/testdata/sf0.1"
N_FILES = 32
SHIFT = 100_000_000  # > any base key at any SF
USER_SHIFT = 1_600   # just past max user_id (1499): chains deepen smoothly

spark = get_spark(app_name="make_scaleup", shuffle_partitions=N_FILES)
spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

ALPHA = "abcdefghijklmnopqrstuvwxyz"


def reps(df, cols_shift, extra=None):
    """Union of REP replicas with the given bigint key columns shifted by
    k*SHIFT; ``extra`` maps column -> fn(col, k) for replica-dependent
    rewrites."""
    parts = []
    for k in range(REP):
        d = df
        for c in cols_shift:
            d = d.withColumn(c, F.col(c) + F.lit(k * SHIFT))
        for c, fn in (extra or {}).items():
            d = d.withColumn(c, fn(F.col(c), k))
        parts.append(d)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def write(df, name):
    df.repartition(N_FILES).write.mode("overwrite").parquet(f"{OUT}/{name}.parquet")
    print(name, "written")


t = lambda name: spark.read.parquet(f"{SRC}/{name}.parquet")

write(t("region"), "region")
write(t("nation"), "nation")
write(reps(t("customer"), ["c_custkey"]), "customer")
write(reps(t("supplier"), ["s_suppkey"]), "supplier")
write(reps(t("part"), ["p_partkey"]), "part")
write(reps(t("orders"), ["o_orderkey", "o_custkey"]), "orders")
write(
    reps(t("lineitem"), ["l_orderkey", "l_partkey", "l_suppkey"]),
    "lineitem",
)
write(
    reps(
        t("documents"),
        ["doc_id"],
        extra={
            "text": lambda c, k: F.translate(
                c, ALPHA, ALPHA[k % 26:] + ALPHA[: k % 26]
            )
        },
    ),
    "documents",
)
write(
    reps(
        t("embeddings"),
        ["vec_id"],
        extra={
            "embedding": lambda c, k: F.expr(
                f"transform(embedding, (x, i) -> CAST(x + 0.37 * "
                f"sin((1 + pmod(vec_id, 97)) * (i + 1) * {k}) AS FLOAT))"
            )
            if k
            else c
        },
    ),
    "embeddings",
)
ev = t("events")
parts = []
for k in range(REP):
    parts.append(
        ev.withColumn("event_id", F.col("event_id") + F.lit(k * SHIFT))
        .withColumn("user_id", F.col("user_id") + F.lit(k * USER_SHIFT))
    )
out = parts[0]
for p in parts[1:]:
    out = out.unionByName(p)
write(out, "events")
print("done:", OUT)
