"""Merge CALIB rows from wide_plan_probe logs into
results/plan_calibration.json (round-5 B/K-dependence extension).

Usage:
  python scripts/merge_calib.py /tmp/b_probe.log [more logs...]

Keeps the existing artifact's rows (the round-4 B=100/K=2004 grid),
appends every ``CALIB {json}`` line found in the given logs (deduped on
(width, B, K, CK), newest wins), restamps the artifact with the CURRENT
git describe, and rewrites the note. Run at a CLEAN sha — the round-4
artifact's ``d06356f-dirty`` provenance is what this fixes (VERDICT r4
item 4).
"""
import json
import subprocess
import sys

REPO = __file__.rsplit("/scripts/", 1)[0]
ART = REPO + "/results/plan_calibration.json"


def main():
    with open(ART) as f:
        art = json.load(f)
    rows = {(r["width"], r["B"], r["K"], r["CK"]): r for r in art["rows"]}
    n_old = len(rows)
    for log in sys.argv[1:]:
        with open(log) as f:
            for ln in f:
                if not ln.startswith("CALIB "):
                    continue
                r = json.loads(ln[len("CALIB "):])
                rows[(r["width"], r["B"], r["K"], r["CK"])] = r
    art["rows"] = [rows[k] for k in sorted(rows)]
    art["git"] = subprocess.check_output(
        ["git", "-C", REPO, "describe", "--always", "--dirty"],
        text=True).strip()
    art.pop("shape", None)
    art["note"] = (
        "forced-CK ladders (scripts/wide_plan_probe.py widths; "
        "NJODE_PROBE_B/K/CKS overrides) at D=5, H=50, masked, prng "
        "dropout; actual_scoped_bytes parsed from Mosaic scoped-VMEM "
        "rejections; bias = actual - _chunk_vmem_bytes estimate; "
        "bias_live_rows normalizes by the row's own pad8(B) * lane(w) * "
        "4B (the _fits_chunk B-proportionality being probed)")
    with open(ART, "w") as f:
        json.dump(art, f, indent=1)
        f.write("\n")
    print(f"{len(art['rows'])} rows ({len(art['rows']) - n_old} new) -> "
          f"{ART} @ {art['git']}")


if __name__ == "__main__":
    main()
