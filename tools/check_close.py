#!/usr/bin/env python3
"""Round-close correctness-artifact gate (round-12 verdict #7: that
round shipped CORRECTNESS_r12.json as a literal `{}` and nothing
failed loudly).

Validates that a correctness artifact (a) parses as JSON, (b) carries
at least as many per-query rows as the suite declares (the
oracle_sql.json the local Verify run dumps is the suite-size
authority), and (c) has no failing rows. Exits non-zero with a named
reason otherwise — wire it into the close checklist so an
empty/truncated artifact kills the round close instead of being
discovered by the judge.

Usage: check_close.py <correctness.json> <verify_outdir>
  <correctness.json>  the artifact to validate, OR the literal word
                      `mirror` to synthesize one from the local
                      check_oracle run (records the mirror directly —
                      the verdict's fallback branch)
  <verify_outdir>     the graft.Verify output dir (oracle_sql.json +
                      per-query parquet) the artifact must cover
"""
import json
import os
import sys

def fail(msg):
    sys.exit(f"ROUND-CLOSE GATE FAILED: {msg}")

def main():
    if len(sys.argv) != 3:
        fail(f"usage: {sys.argv[0]} <correctness.json|mirror> <verify_outdir>")
    art_path, outdir = sys.argv[1], sys.argv[2]
    oracle_path = os.path.join(outdir, "oracle_sql.json")
    if not os.path.exists(oracle_path):
        fail(f"no oracle_sql.json under {outdir} — run graft.Verify first")
    with open(oracle_path) as f:
        suite = json.load(f)
    n_suite = len(suite)
    if n_suite < 1:
        fail(f"oracle_sql.json is empty ({oracle_path})")

    if art_path == "mirror":
        # record the local mirror directly: every per-query parquet the
        # Verify run wrote, counted against the suite
        def qname(d):
            return d[:-len(".parquet")] if d.endswith(".parquet") else d
        queries = sorted(qname(d) for d in os.listdir(outdir)
                         if os.path.isdir(os.path.join(outdir, d))
                         and qname(d) in suite)
        missing = sorted(set(suite) - set(queries))
        if missing:
            fail(f"local mirror missing {len(missing)} suite queries: "
                 f"{missing[:10]}")
        print(f"OK mirror: {len(queries)} query outputs cover the "
              f"{n_suite}-query oracle suite under {outdir}")
        return

    try:
        with open(art_path) as f:
            art = json.load(f)
    except Exception as e:
        fail(f"{art_path} does not parse as JSON: {e}")
    # type-check BEFORE touching .get/.items — a JSON list/string/number
    # is the exact silent-artifact class this gate exists to catch, not
    # an AttributeError (round-13 ADVICE)
    if not isinstance(art, dict):
        fail(f"{art_path} top level is {type(art).__name__}, not a "
             f"per-query object — malformed artifact")
    rows = art.get("queries", art)
    if not isinstance(rows, dict):
        fail(f"{art_path} 'queries' is {type(rows).__name__}, not an "
             f"object — malformed artifact")
    per_query = {k: v for k, v in rows.items()
                 if isinstance(k, str) and k.startswith("q")}
    if len(per_query) < n_suite:
        fail(f"{art_path} carries {len(per_query)} per-query rows but the "
             f"suite declares {n_suite} ({oracle_path}) — empty or "
             f"truncated artifact")

    def green(v):
        """A row is green only as a dict with an explicit pass signal:
        driver schema (rows/schema/hash all true, or the documented
        rows-only convention err == 'no_oracle' with spark_rows > 0) or
        the legacy mirror schema (match/ok/rows_only truthy). Anything
        else — including a bare `false`/`true` value — is NOT green
        (round-13 ADVICE: {'q1': false, ...} must not pass)."""
        if not isinstance(v, dict):
            return False
        if v.get("rows_match") and v.get("schema_match") \
                and v.get("hash_match"):
            return True
        if v.get("err") == "no_oracle" and (v.get("spark_rows") or 0) > 0:
            return True
        return bool(v.get("match") or v.get("ok") or v.get("rows_only"))

    bad = sorted(k for k, v in per_query.items() if not green(v))
    if bad:
        fail(f"{len(bad)} rows not green in {art_path}: {bad[:10]}")
    print(f"OK {art_path}: {len(per_query)} per-query rows ≥ suite's "
          f"{n_suite}, all green")

if __name__ == "__main__":
    main()
