#!/usr/bin/env python3
"""Round-end self-check: the same DuckDB-vs-Spark compare as check.py,
emitted in the driver's CORRECTNESS_r{N}.json schema (per-query
rows_match/schema_match/hash_match/spark_rows/oracle_rows/err) so every
round carries a COMMITTED correctness record even if the driver-side
artifact is lost (CORRECTNESS_r12/r13.json both arrived as `{}`).

Invoked by `graft.Verify` itself after every full-registry run, so the
committed artifact exists the moment Verify exits.

Per-query failures (oracle error, unreadable dump, compare crash) are
RECORDED in that query's `err` field and never abort the run — the
point is to always emit a complete verdict. Queries run on a small
process pool (SELF_CHECK_JOBS, default min(8, cpus)) to keep the
full-registry check inside the driver's session window.

Usage: python3 tools/self_check.py <sfDir> <verifyOutDir> <out.json>
"""
import sys, os, json, glob
from multiprocessing import Pool

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

_con = None
_out_dir = None
_oracles = None


def norm(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(str(r[i]) for i in order) for r in rows]
    out.sort()
    return [cols[i] for i in order], out


def _init(sf_dir, out_dir, oracles):
    global _con, _out_dir, _oracles
    import duckdb
    _con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            _con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    _out_dir = out_dir
    _oracles = oracles


def check_one(name):
    entry = {
        "rows_match": False, "schema_match": False, "hash_match": False,
        "spark_rows": None, "oracle_rows": None, "err": None,
    }
    files = glob.glob(f"{_out_dir}/{name}/*.parquet")
    if not files:
        entry["err"] = "no spark output"
        return name, entry
    try:
        o = _con.execute(_oracles[name])
        ocols = [d[0] for d in o.description]
        orows = o.fetchall()
    except Exception as e:
        entry["err"] = f"oracle error: {e}"
        return name, entry
    # the dump read and compare get the same per-query containment as
    # the oracle: one corrupt parquet must cost ONE entry, not the run
    try:
        s = _con.execute(f"SELECT * FROM read_parquet({files!r})")
        scols = [d[0] for d in s.description]
        srows = s.fetchall()
        oc, orn = norm(orows, ocols)
        sc, srn = norm(srows, scols)
        entry["spark_rows"], entry["oracle_rows"] = len(srn), len(orn)
        entry["schema_match"] = oc == sc
        entry["rows_match"] = len(orn) == len(srn)
        entry["hash_match"] = entry["schema_match"] and orn == srn
    except Exception as e:
        entry["err"] = f"compare error: {e}"
    return name, entry


def main():
    sf_dir, out_dir, out_json = sys.argv[1], sys.argv[2], sys.argv[3]
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    names = sorted(oracles)
    jobs = int(os.environ.get("SELF_CHECK_JOBS", min(8, os.cpu_count() or 1)))
    if jobs <= 1:
        _init(sf_dir, out_dir, oracles)
        results = [check_one(n) for n in names]
    else:
        with Pool(jobs, initializer=_init, initargs=(sf_dir, out_dir, oracles)) as pool:
            results = pool.map(check_one, names)
    report = dict(results)
    with open(out_json, "w") as f:
        json.dump(report, f, indent=1, sort_keys=True)
    ok = sum(1 for e in report.values()
             if e["rows_match"] and e["schema_match"] and e["hash_match"])
    print(f"{ok}/{len(report)} fully matched -> {out_json}")
    sys.exit(0 if ok == len(report) else 1)


if __name__ == "__main__":
    main()
