# Dev-only self-check mirroring the driver's correctness gate: runs the
# oracle SQL (dumped by graft.Verify as oracle_sql.json) in DuckDB over
# the same parquet tables and hash-compares against the Spark parquet
# dumps. NOT part of the engine — the Scala library has no Python deps.
import duckdb, json, sys, hashlib

out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/verify_out"
sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
only = sys.argv[3].split(",") if len(sys.argv) > 3 else None

# Record the oracle engine version in every selfcheck transcript: the
# r11 q_random_projection mismatch was builder-vs-driver DuckDB skew,
# undiagnosable because no record said WHICH engine the green selfchecks
# ran against.
print(f"oracle engine: duckdb {duckdb.__version__}")

with open(f"{out_dir}/oracle_sql.json") as f:
    oracles = json.load(f)

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def canon(rows, cols):
    # sort columns by name, round floats, stringify
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(repr(round(r[i], 9)) if isinstance(r[i], float) else repr(r[i])
                         for i in order))
    return sorted(cols), out

fails = 0
for name, sql in sorted(oracles.items()):
    if only and name not in only:
        continue
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    try:
        ores = con.execute(sql)
        ocols = [d[0] for d in ores.description]
        orows = ores.fetchall()
    except Exception as e:
        print(f"FAIL {name}: oracle error: {e}")
        fails += 1
        continue
    try:
        sres = con.execute(f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
        scols = [d[0] for d in sres.description]
        srows = sres.fetchall()
    except Exception as e:
        print(f"FAIL {name}: spark dump error: {e}")
        fails += 1
        continue
    oc, ov = canon(orows, ocols)
    sc, sv = canon(srows, scols)
    if oc != sc:
        print(f"FAIL {name}: schema mismatch spark={sc} oracle={oc}")
        fails += 1
    elif len(ov) != len(sv):
        print(f"FAIL {name}: rows spark={len(sv)} oracle={len(ov)}")
        fails += 1
    elif ov != sv:
        diffs = [i for i, (a, b) in enumerate(zip(ov, sv)) if a != b][:3]
        print(f"FAIL {name}: value mismatch at rows {diffs}")
        for i in diffs:
            print(f"  oracle: {ov[i]}\n  spark : {sv[i]}")
        fails += 1
    else:
        print(f"ok   {name}: {len(sv)} rows")
    con.close()
sys.exit(1 if fails else 0)
