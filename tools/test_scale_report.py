#!/usr/bin/env python3
"""Fixture tests for scale_report's gate rule 0 (empty_run_violations)
— the silent-environment-drift detector with its two documented
exemptions:

 1. a query LEGITIMATELY empty at x1 never flags (empty in = empty
    out is the x1 baseline's own truth; drift is rows VANISHING as
    the factor grows, not absence from the start);
 2. a scaled-corpus zero whose own DuckDB oracle ALSO returns zero on
    that corpus is adjudicated non-gating (the r9 q_heavy_hitters
    case: ScaleGen's perturbation dilutes every token below the
    n/(k+1) bound — zero IS the right answer);
 3. out_rows == -1 (a dump predating the sink probe) is exempt.

Run: python3 tools/test_scale_report.py   (exit 0 = all pass)
"""
import sys, os
sys.path.insert(0, os.path.dirname(__file__))
import scale_report


def gating(violations):
    return [v for v in violations if v.get("gate", True)]


def with_oracle(result, fn, *args):
    """Run fn with oracle_rows_at stubbed to `result`."""
    real = scale_report.oracle_rows_at
    scale_report.oracle_rows_at = lambda q, f: result
    try:
        return fn(*args)
    finally:
        scale_report.oracle_rows_at = real


def run():
    failures = []

    def check(name, cond):
        print(("PASS " if cond else "FAIL ") + name)
        if not cond:
            failures.append(name)

    # 1. empty at x1 AND empty at x10/x32: a diff/unmatched report that
    # finds nothing — must produce ZERO violations (no oracle needed)
    v = scale_report.empty_run_violations(
        "q_diff", {1: {"out_rows": 0}, 10: {"out_rows": 0}, 32: {"out_rows": 0}})
    check("empty-at-x1 never flags", v == [])

    # 2. rows at x1 vanish at x10, oracle unavailable (None) -> the
    # flag GATES (drift must not pass unadjudicated)
    v = with_oracle(None, scale_report.empty_run_violations,
                    "q_drift", {1: {"out_rows": 100}, 10: {"out_rows": 0}})
    check("x1-rows->x10-zero gates when oracle unavailable",
          len(gating(v)) == 1 and gating(v)[0]["rule"] == "zero_output_rows")

    # 3. same shape but the oracle on the scaled corpus ALSO says 0 ->
    # adjudicated, non-gating, and labeled as such
    v = with_oracle(0, scale_report.empty_run_violations,
                    "q_hh", {1: {"out_rows": 25}, 10: {"out_rows": 0}})
    check("oracle-confirmed zero is adjudicated non-gating",
          gating(v) == [] and len(v) == 1
          and v[0]["rule"] == "zero_output_adjudicated_legitimate")

    # 4. oracle returns ROWS on the scaled corpus while spark wrote 0:
    # genuine drift, gates even though an oracle ran
    v = with_oracle(7, scale_report.empty_run_violations,
                    "q_bad", {1: {"out_rows": 25}, 10: {"out_rows": 0}})
    check("oracle-contradicted zero still gates",
          len(gating(v)) == 1 and gating(v)[0]["rule"] == "zero_output_rows")

    # 5. pre-probe dumps (out_rows == -1) are exempt on either side
    v = scale_report.empty_run_violations(
        "q_old", {1: {"out_rows": -1}, 10: {"out_rows": 0}})
    check("out_rows=-1 baseline is exempt", v == [])
    v = scale_report.empty_run_violations(
        "q_old2", {1: {"out_rows": 100}, 10: {"out_rows": -1}})
    check("out_rows=-1 scaled run is exempt", v == [])

    # 6. healthy run: rows everywhere -> nothing
    v = scale_report.empty_run_violations(
        "q_ok", {1: {"out_rows": 10}, 10: {"out_rows": 100}})
    check("healthy run produces no violations", v == [])

    if failures:
        print(f"\n{len(failures)} FAILED: {failures}")
        return 1
    print("\nall rule-0 fixtures pass")
    return 0


if __name__ == "__main__":
    sys.exit(run())
