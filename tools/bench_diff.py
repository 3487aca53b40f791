"""Round-over-round BENCH_FULL mover report — the adjudication step that
round 7 ran by hand, mechanized.

Shared-box timings move together 15-25% with ambient load (README
"Benchmark snapshot"), so a raw total diff says nothing; what matters is
per-query RATIOS against the prior artifact, split into:

- movers: queries past the ratio threshold AND past an absolute floor
  (sub-second queries flap on scheduler jitter — a 0.2s -> 0.5s "2.5x" is
  noise, not a plan change);
- the ambient factor: the median ratio over all stable queries — if the
  whole registry moved ~1.15x together, that's the box, not the code. The
  report prints movers both raw and ambient-normalized.

Round-7 lesson encoded here: adjudicate movers by RERUNNING them isolated
before believing either direction (two of three round-7 "regressions" were
transients that vanished on a quiet rerun).

Usage:
  python tools/bench_diff.py                      # HEAD artifact vs working tree
  python tools/bench_diff.py OLD.json NEW.json    # explicit artifacts
"""

from __future__ import annotations

import json
import statistics
import subprocess
import sys


def load(path_or_ref: str) -> dict[str, float]:
    if path_or_ref.startswith("git:"):
        proc = subprocess.run(
            ["git", "show", path_or_ref[4:]], capture_output=True, text=True
        )
        if proc.returncode != 0 or not proc.stdout.strip():
            sys.exit(
                f"bench_diff: git show {path_or_ref[4:]!r} failed "
                f"(rc={proc.returncode}): {proc.stderr.strip() or 'empty output'}"
            )
        data = json.loads(proc.stdout)
    else:
        with open(path_or_ref) as f:
            data = json.load(f)
    return {k: v for k, v in data["queries"].items() if v}


def main() -> None:
    args = sys.argv[1:]
    old_src = args[0] if args else "git:HEAD~1:BENCH_FULL.json"
    new_src = args[1] if len(args) > 1 else "BENCH_FULL.json"
    old, new = load(old_src), load(new_src)
    common = sorted(set(old) & set(new))
    ratios = [new[k] / old[k] for k in common]
    ambient = statistics.median(ratios)
    print(
        f"{len(common)} shared queries; median ratio (ambient factor): "
        f"{ambient:.2f}x; old sum {sum(old[k] for k in common):.1f}s -> "
        f"new sum {sum(new[k] for k in common):.1f}s"
    )
    movers = []
    for k in common:
        r = new[k] / old[k]
        if max(new[k], old[k]) >= 1.0 and (r >= 1.5 * ambient or r <= 0.6 * ambient):
            movers.append((r, k))
    movers.sort(reverse=True)
    if not movers:
        print("no movers past threshold (1.5x/0.6x of ambient, >=1s) — clean round")
    for r, k in movers:
        print(
            f"  {k}: {old[k]:.2f}s -> {new[k]:.2f}s  ({r:.2f}x raw, "
            f"{r / ambient:.2f}x ambient-normalized) — rerun isolated before believing it"
        )
    added = sorted(set(new) - set(old))
    if added:
        print(f"new queries ({len(added)}): " + ", ".join(f"{k}={new[k]:.2f}s" for k in added))


if __name__ == "__main__":
    main()
