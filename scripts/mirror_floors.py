"""Derive accuracy-ladder floors from the torch-mirror ground truth.

VERDICT r3 #8: every ladder floor except pointconv's was
self-referential ("our round-2 measurement minus 20%") — a slow
family-wide dynamics regression would have been baked into the floors.
scripts/mirror_ladder.py trains the reference-keyed torch mirrors at
the EXACT ladder budgets; this script turns its mirror_ladder.jsonl
into suggested floors with the r3 pointconv convention:

    floor = 0.8 * mirror_best - 3        (≈ mirror minus the measured
                                          ±5 trajectory noise band)

and prints them against the current LADDER floors for review. The
floors stay hand-applied in accuracy_ladder.py (with the mirror value
cited) — this is the audit trail, not an auto-updater.
"""

import json
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT / "scripts"))

from accuracy_ladder import LADDER  # noqa: E402


def main():
    rows = {}
    path = ROOT / "mirror_ladder.jsonl"
    if path.exists():
        for line in path.read_text().splitlines():
            if not line.strip():
                continue
            r = json.loads(line)
            rows[(r["task"], r["model"])] = r
    print(f"{'task/model':22s} {'floor':>6} {'mirror':>7} "
          f"{'suggested':>9}  note")
    for task, model, _extra, floor in LADDER:
        r = rows.get((task, model))
        if r is None:
            print(f"{task}/{model:18s} {floor!s:>6} {'—':>7} {'—':>9}"
                  f"  no mirror row yet")
            continue
        mb = r["mirror_best"]
        sug = round(0.8 * mb - 3, 1)
        note = ""
        if floor is not None and sug < floor - 2:
            note = "current floor ABOVE mirror-derived (ok, stricter)"
        elif floor is not None and sug > floor + 2:
            note = "current floor LOOSER than mirror-derived — tighten"
        print(f"{task}/{model:18s} {floor!s:>6} {mb:7.2f} {sug:9.1f}"
              f"  {note}")


if __name__ == "__main__":
    main()
