#!/usr/bin/env python3
"""Assemble a round correctness artifact (the CLUSTER_CORRECTNESS_r12
format) from check_oracle.py output: run the oracle compare over a
Verify dump and write {meta..., n_pass, n_total, queries:{name:
{detail, hash_match}}} as JSON. (Dev tool only.)

Usage: make_artifact.py <sfDir> <verifyOutDir> <outJson> [k=v ...]
"""
import json, subprocess, sys, os

def main():
    sf_dir, out_dir, out_json = sys.argv[1], sys.argv[2], sys.argv[3]
    meta = dict(kv.split("=", 1) for kv in sys.argv[4:])
    here = os.path.dirname(os.path.abspath(__file__))
    p = subprocess.run(
        [sys.executable, os.path.join(here, "check_oracle.py"), sf_dir, out_dir],
        capture_output=True, text=True, check=True)
    queries = {}
    for line in p.stdout.splitlines():
        if line.startswith(("PASS ", "FAIL ")):
            mark, rest = line.split(" ", 1)
            name, detail = rest.split(": ", 1)
            queries[name] = {"detail": detail, "hash_match": mark == "PASS"}
    doc = dict(meta)
    doc["n_pass"] = sum(1 for q in queries.values() if q["hash_match"])
    doc["n_total"] = len(queries)
    doc["queries"] = dict(sorted(queries.items()))
    with open(out_json, "w") as f:
        json.dump(doc, f, indent=1, sort_keys=False)
        f.write("\n")
    print(f"{doc['n_pass']}/{doc['n_total']} -> {out_json}")

if __name__ == "__main__":
    main()
