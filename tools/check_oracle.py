#!/usr/bin/env python3
"""Local stand-in for the driver's t2 gate: run graft.Verify, then compare
each query's parquet output against its DuckDB oracle on the same tables.

Usage: python3 tools/check_oracle.py [sfdir] [--only name1,name2]
"""
import json, os, shutil, subprocess, sys, glob

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF = sys.argv[1] if len(sys.argv) > 1 and not sys.argv[1].startswith("--") else "/root/testdata/sf0.01"
ONLY = None
if "--only" in sys.argv:
    ONLY = set(sys.argv[sys.argv.index("--only") + 1].split(","))
# SF-specific scratch dir: sweeps at different scales must not race each
# other (a concurrent default-gate run would rmtree this dump mid-compare).
OUT = f"/tmp/graft_verify_{os.path.basename(SF.rstrip(os.sep))}"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

ADD_OPENS = [f"--add-opens={p}=ALL-UNNAMED" for p in [
    "java.base/java.lang", "java.base/java.lang.invoke", "java.base/java.lang.reflect",
    "java.base/java.io", "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic", "java.base/sun.nio.ch",
    "java.base/sun.nio.cs", "java.base/sun.security.action", "java.base/sun.util.calendar"]]

def run_verify():
    # Clean slate: a stale parquet dir from a previous run must never be
    # compared as if this run produced it.
    shutil.rmtree(OUT, ignore_errors=True)
    cp = f"{REPO}/target/scala-2.13/classes:" + ":".join(glob.glob("/opt/spark/jars/*.jar"))
    env = dict(os.environ, SPARK_GRAFT_CPUS=os.environ.get("SPARK_GRAFT_CPUS", "8"))
    # Scope the Spark dump to the requested subset too — iterating on one
    # query should not pay the whole suite's Verify pass.
    if ONLY:
        env["GRAFT_VERIFY_ONLY"] = ",".join(sorted(ONLY))
    cmd = ["java", *ADD_OPENS, "-Xmx8g", "-Dspark.ui.enabled=false",
           "-Dspark.sql.session.timeZone=UTC", "-cp", cp, "graft.Verify", SF, OUT]
    r = subprocess.run(cmd, env=env, capture_output=True, text=True)
    for line in r.stderr.splitlines():
        if "[verify]" in line or "Exception" in line:
            print("  !", line)
    if r.returncode != 0:
        print(r.stderr[-3000:]); sys.exit(1)

# Oracle-engine pin, the DuckDB analog of AAEnvCanarySpec's Spark pin:
# every hash comparison in the gate is only as stable as the engine that
# computed the expected side, so a silent DuckDB bump must NAME itself
# as a failing check (VERDICT r8 #7) instead of surfacing as mysterious
# value diffs (or, worse, not surfacing at all while semantics shift).
EXPECTED_DUCKDB = "1.0.0"

def compare():
    import duckdb
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    oracle = json.load(open(f"{OUT}/oracle_sql.json"))
    results = {}
    names = sorted(os.path.basename(p) for p in glob.glob(f"{OUT}/*") if os.path.isdir(p))
    mpath = f"{OUT}/manifest.txt"
    if os.path.exists(mpath):
        written = set(open(mpath).read().split())
        for name in sorted(set(names) - written):
            results[name] = "NOT IN MANIFEST (query failed at runtime?)"
        names = [n for n in names if n in written]
    for name in names:
        if ONLY and name not in ONLY:
            continue
        got = con.sql(f"SELECT * FROM '{OUT}/{name}/*.parquet'").df()
        if name not in oracle:
            results[name] = f"rows-only: {len(got)} rows" + (" EMPTY!" if len(got) == 0 else "")
            continue
        try:
            exp = con.sql(oracle[name]).df()
        except Exception as e:
            results[name] = f"ORACLE SQL ERROR: {e}"
            continue
        got = got.reindex(sorted(got.columns), axis=1)
        exp = exp.reindex(sorted(exp.columns), axis=1)
        if list(got.columns) != list(exp.columns):
            results[name] = f"COLUMN MISMATCH spark={list(got.columns)} duck={list(exp.columns)}"
            continue
        if len(got) != len(exp):
            results[name] = f"ROWCOUNT MISMATCH spark={len(got)} duck={len(exp)}"
            continue
        gs = got.sort_values(by=list(got.columns)).reset_index(drop=True)
        es = exp.sort_values(by=list(exp.columns)).reset_index(drop=True)
        bad = []
        for c in got.columns:
            a, b = gs[c], es[c]
            if str(a.dtype) != str(b.dtype):
                bad.append(f"{c}: dtype {a.dtype} vs {b.dtype}")
            try:
                eq = (a == b) | (a.isna() & b.isna())
            except Exception:
                eq = a.astype(str) == b.astype(str)
            if not eq.all():
                i = int((~eq).idxmax())
                bad.append(f"{c}: {int((~eq).sum())} diffs, first@{i}: {a[i]!r} vs {b[i]!r}")
        results[name] = "OK" if not bad else "VALUE MISMATCH: " + "; ".join(bad[:4])
    results["aa_env_duckdb_pin"] = ("OK" if duckdb.__version__ == EXPECTED_DUCKDB
        else f"DUCKDB VERSION DRIFT: running {duckdb.__version__}, pinned {EXPECTED_DUCKDB} "
             "— re-validate the oracle SQL surface, then bump EXPECTED_DUCKDB")
    npass = sum(1 for v in results.values() if v == "OK" or v.startswith("rows-only") and "EMPTY" not in v)
    nfail = 0
    for name, v in sorted(results.items()):
        mark = "PASS" if v == "OK" else ("INFO" if v.startswith("rows-only") and "EMPTY" not in v else "FAIL")
        nfail += mark == "FAIL"
        print(f"{mark}  {name}: {v}")
    # Version stamp: which engines produced/judged this run, so an
    # environment bump names itself in the gate output.
    versions = {"duckdb": duckdb.__version__}
    vpath = f"{OUT}/versions.json"
    if os.path.exists(vpath):
        try:
            versions.update(json.load(open(vpath)))
        except (ValueError, OSError) as e:
            # A truncated stamp (e.g. a killed Verify run) must not crash
            # the gate after the per-query lines but before the summary.
            versions["stamp_error"] = str(e)[:80]
    print(f"== versions: {json.dumps(versions, sort_keys=True)} ==")
    print(f"== {npass}/{len(results)} ok ==")
    # Exit non-zero on ANY FAIL line — including the duckdb version pin —
    # so automation keyed on exit status sees what stdout says (ADVICE
    # r9 #4): a gate whose failures are stdout-only is not a gate.
    return nfail

if __name__ == "__main__":
    if "--skip-run" not in sys.argv:
        run_verify()
    sys.exit(min(compare(), 125))
