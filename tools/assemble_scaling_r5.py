#!/usr/bin/env python3
"""Assemble tools/scaling_pinned_r5.json (ONE line of JSON) from the three
round-5 pinned campaign outputs. Each input file holds the single
{"mode":"pinned_campaign",...} line that `graft.ScalingProbe campaign`
prints (grep it out of the sbt log).

Usage: assemble_scaling_r5.py <4v16.json> <8v32_control.json> <8v32_tmpfs.json>
"""
import json
import sys


def load(path: str):
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line.startswith('{"mode":"pinned_campaign"'):
                return json.loads(line)
    raise SystemExit(f"no pinned_campaign line in {path}")


def main():
    gate, ctrl, tmpfs = (load(p) for p in sys.argv[1:4])
    out = {
        "round": 5,
        # gate pairing per BASELINE.md adoption (unchanged config vs r4)
        "campaign_4v16": gate,
        # same-session control for the tmpfs experiment (default /tmp
        # shuffle dirs, same config as r4's diagnostic campaign)
        "campaign_8v32": ctrl,
        # VERDICT r4 ask #7: shuffle/spill pinned to tmpfs /dev/shm via
        # SPARK_GRAFT_LOCAL_DIR to test whether 32-leg variance is disk
        # contention; compare efficiency_median against campaign_8v32
        "campaign_8v32_tmpfs_localdir": tmpfs,
    }
    with open("tools/scaling_pinned_r5.json", "w") as f:
        f.write(json.dumps(out, separators=(",", ":")) + "\n")
    for k in ("campaign_4v16", "campaign_8v32", "campaign_8v32_tmpfs_localdir"):
        c = out[k]
        print(k, "median", c["efficiency_median"], "best", c["efficiency_best"])


if __name__ == "__main__":
    main()
