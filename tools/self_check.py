#!/usr/bin/env python3
"""Round-end self-check: the same DuckDB-vs-Spark compare as check.py,
emitted in the driver's CORRECTNESS_r{N}.json schema (per-query
rows_match/schema_match/hash_match/spark_rows/oracle_rows/err) so every
round carries a COMMITTED correctness record even if the driver-side
artifact is lost (round 12's CORRECTNESS_r12.json arrived as `{}`).

Usage: python3 tools/self_check.py <sfDir> <verifyOutDir> <out.json>
"""
import sys, os, json, glob
import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(str(r[i]) for i in order) for r in rows]
    out.sort()
    return [cols[i] for i in order], out


def main():
    sf_dir, out_dir, out_json = sys.argv[1], sys.argv[2], sys.argv[3]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    report = {}
    for name in sorted(oracles):
        entry = {
            "rows_match": False, "schema_match": False, "hash_match": False,
            "spark_rows": None, "oracle_rows": None, "err": None,
        }
        report[name] = entry
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            entry["err"] = "no spark output"
            continue
        try:
            o = con.execute(oracles[name])
            ocols = [d[0] for d in o.description]
            orows = o.fetchall()
        except Exception as e:
            entry["err"] = f"oracle error: {e}"
            continue
        s = con.execute(f"SELECT * FROM read_parquet({files!r})")
        scols = [d[0] for d in s.description]
        srows = s.fetchall()
        oc, orn = norm(orows, ocols)
        sc, srn = norm(srows, scols)
        entry["spark_rows"], entry["oracle_rows"] = len(srn), len(orn)
        entry["schema_match"] = oc == sc
        entry["rows_match"] = len(orn) == len(srn)
        entry["hash_match"] = entry["schema_match"] and orn == srn
    with open(out_json, "w") as f:
        json.dump(report, f, indent=1, sort_keys=True)
    ok = sum(1 for e in report.values()
             if e["rows_match"] and e["schema_match"] and e["hash_match"])
    print(f"{ok}/{len(report)} fully matched -> {out_json}")
    sys.exit(0 if ok == len(report) else 1)


if __name__ == "__main__":
    main()
