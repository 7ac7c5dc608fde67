#!/usr/bin/env python3
"""Gate-sensitivity drill: prove the correctness gate CAN go red.

The q220 partial-oracle blind spot (r16-r17: an inner join that
shrank/multiplied oracle and Spark identically, so dropped and
duplicated dump rows passed) survived two rounds of green gates because
nothing ever tested that the gate catches a seeded defect. This script
is mutation testing for the oracle harness itself: copy a query's dump
out of an existing Verify run, seed ONE defect per class, and assert
scripts/check.py reports FAIL (or, for the documented-by-design cases,
PASS) exactly as the oracle contract claims. Exit 0 iff every case
behaves.

Defect classes, against the hardened partial oracles (q220/q222/q224):
  drop     a dump row vanishes        → -888 missing-key sentinel
  dup      a dump row appears twice   → -777 duplicate-key sentinel
  extra    a key outside the base set → reconstructed-base row count
  null     a value silently nulled    → -999 NULL-pattern sentinel
  perturb  one double off by 1e-3     → PASS **by design** in the row's
           OWN oracle (the zlib value rides the self-join; that is what
           "partial" means) ...
  flip     ... and the backstop that makes the blindness safe: the same
           dump value flipped across a gate boundary (plant -1's cratio
           0.02 → 0.99) breaks the DOWNSTREAM row (q221/q223/q225),
           whose oracle replays composition logic over the mutated dump
           while its Spark dump used the true recomputed values.
Plus q01 (standard full oracle): perturb → FAIL directly.

Usage: python3 scripts/gate_drill.py [sfDir] [verifyOut]
  sfDir     tables the oracles read        (default /root/testdata/sf0.001)
  verifyOut an existing graft.Verify dump  (default /tmp/verify_out)
            — must contain oracle_sql.json and the target query dirs
            (run `python3 scripts/check.py <sfDir> <verifyOut>` first).
"""
import sys, os, json, glob, shutil, subprocess
import numpy as np
import pandas as pd

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
SRC = os.path.abspath(sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out")
DRILL = "/tmp/gate_drill_out"
HERE = os.path.dirname(os.path.abspath(__file__))

# (dump to mutate, mutation, query whose oracle must react, expected)
CASES = [
    ("q220_compress_ratios", "none",    "q220_compress_ratios", "PASS"),
    ("q220_compress_ratios", "drop",    "q220_compress_ratios", "FAIL"),
    ("q220_compress_ratios", "dup",     "q220_compress_ratios", "FAIL"),
    ("q220_compress_ratios", "extra",   "q220_compress_ratios", "FAIL"),
    ("q220_compress_ratios", "null",    "q220_compress_ratios", "FAIL"),
    ("q220_compress_ratios", "perturb", "q220_compress_ratios", "PASS"),
    ("q220_compress_ratios", "flip",    "q221_compress_report", "FAIL"),
    ("q222_v6_ratios",       "drop",    "q222_v6_ratios",       "FAIL"),
    ("q222_v6_ratios",       "dup",     "q222_v6_ratios",       "FAIL"),
    ("q222_v6_ratios",       "flip",    "q223_pipeline_v6",     "FAIL"),
    ("q224_v7_delta_ratios", "drop",    "q224_v7_delta_ratios", "FAIL"),
    ("q224_v7_delta_ratios", "dup",     "q224_v7_delta_ratios", "FAIL"),
    ("q224_v7_delta_ratios", "flip",    "q225_pipeline_v7",     "FAIL"),
    ("q01_groupby_agg",      "perturb", "q01_groupby_agg",      "FAIL"),
]


def mutate(df: pd.DataFrame, kind: str) -> pd.DataFrame:
    i = len(df) // 3
    assert len(df) > 3, "dump too small to mutate meaningfully"
    if kind == "none":
        return df
    if kind == "drop":
        return df.drop(df.index[i]).reset_index(drop=True)
    if kind == "dup":  # adjacent duplicate: pure-membership defect, not order
        return pd.concat([df.iloc[:i + 1], df.iloc[i:i + 1], df.iloc[i + 1:]],
                         ignore_index=True)
    if kind == "extra":  # a key the oracle's reconstructed base never has
        r = df.iloc[[i]].copy()
        for c in r.columns:
            if pd.api.types.is_integer_dtype(r[c]):
                r[c] = 999999999
        return pd.concat([df, r], ignore_index=True)
    if kind == "flip":  # gate-crossing value defect: the looping plant
        # (cratio ≈ 0.02, gated OUT) claims near-incompressibility —
        # the downstream oracle now gates it IN while the downstream
        # Spark dump (built on true recomputed ratios) never saw it
        assert (df.doc_id == -1).any(), "plant -1 missing from dump"
        df.loc[df.doc_id == -1, "cratio"] = 0.99
        return df
    floats = [c for c in df.columns if pd.api.types.is_float_dtype(df[c])]
    ints = [c for c in df.columns if pd.api.types.is_integer_dtype(df[c])]
    if kind == "perturb":  # one value off by 1e-3 (or 1 for int-only dumps)
        if floats:
            c = floats[0]
            j = df.index[df[c].notna()][0]
            df.loc[j, c] = df.loc[j, c] + 1e-3
        else:
            c = ints[0]
            df.loc[df.index[i], c] = df.loc[df.index[i], c] + 1
        return df
    if kind == "null":  # a spurious NULL where a value belongs: NaN in a
        # float64 frame lands as a parquet NULL via pyarrow — exactly
        # what a silently-nulled Spark value would dump
        c = floats[0]
        j = df.index[df[c].notna()][0]
        df.loc[j, c] = np.nan
        return df
    raise ValueError(kind)


def run_case(mut_q: str, kind: str, check_q: str, expected: str,
             oracle: dict) -> bool:
    shutil.rmtree(DRILL, ignore_errors=True)
    os.makedirs(f"{DRILL}/{mut_q}")
    df = pd.read_parquet(f"{SRC}/{mut_q}")
    mutate(df, kind).to_parquet(f"{DRILL}/{mut_q}/part-0.parquet", index=False)
    if check_q != mut_q:  # downstream row: its own dump stays clean
        shutil.copytree(f"{SRC}/{check_q}", f"{DRILL}/{check_q}")
    # the dump-reading oracle must read the (mutated) copies, not SRC
    with open(f"{DRILL}/oracle_sql.json", "w") as f:
        json.dump({check_q: oracle[check_q].replace(SRC, DRILL)}, f)
    r = subprocess.run(
        [sys.executable, f"{HERE}/check.py", SF, DRILL, "--skip-verify",
         check_q],
        capture_output=True, text=True)
    verdict, detail = None, f"no verdict line (rc={r.returncode})"
    for line in r.stdout.splitlines():
        if line.startswith(("PASS ", "FAIL ")) and check_q in line:
            verdict, detail = line.split()[0], line
            break
    ok = verdict == expected
    print(f"{'ok ' if ok else 'BAD'}  {mut_q:22s} {kind:8s}"
          f" -> {check_q:22s} expected={expected} got={verdict}"
          + ("" if ok else f"\n     {detail}"))
    return ok


def main() -> int:
    oracle_path = f"{SRC}/oracle_sql.json"
    if not os.path.exists(oracle_path):
        sys.exit(f"{oracle_path} missing — run "
                 f"`python3 scripts/check.py {SF} {SRC}` first")
    oracle = json.load(open(oracle_path))
    bad = 0
    for mut_q, kind, check_q, expected in CASES:
        missing = [q for q in {mut_q, check_q}
                   if q not in oracle or not glob.glob(f"{SRC}/{q}/*.parquet")]
        if missing:
            print(f"BAD  {mut_q:22s} {kind:8s} — missing in {SRC}: {missing}")
            bad += 1
            continue
        if not run_case(mut_q, kind, check_q, expected, oracle):
            bad += 1
    print(f"== gate drill: {len(CASES) - bad}/{len(CASES)} cases behaved ==")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
