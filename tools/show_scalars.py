"""Summarize / tail the JSONL scalar logs trainvali writes (the
TensorBoard-replacement viewer).

Usage:
    python tools/show_scalars.py <outdir>            # summary per tag
    python tools/show_scalars.py <outdir> --tag loss_train   # series
"""

import argparse
import json
import os
from glob import glob

ap = argparse.ArgumentParser(description=__doc__)
ap.add_argument("outdir", type=str,
                help="experiment outdir (containing summary_*/)")
ap.add_argument("--tag", type=str, default=None)
args = ap.parse_args()


def load(outdir):
    recs = []
    for f in glob(os.path.join(outdir, "summary_*", "scalars.jsonl")):
        split = os.path.basename(os.path.dirname(f)).replace(
            "summary_", "")
        for line in open(f):
            r = json.loads(line)
            r["split"] = split
            recs.append(r)
    return recs


def main():
    recs = [r for r in load(args.outdir) if "value" in r]
    if not recs:
        raise SystemExit("No scalars under %s" % args.outdir)
    if args.tag:
        for r in sorted(
                (r for r in recs if r["tag"] == args.tag),
                key=lambda r: r["step"]):
            print("%6d  %.6g" % (r["step"], r["value"]))
        return
    by_tag = {}
    for r in recs:
        by_tag.setdefault((r["split"], r["tag"]), []).append(r)
    print("%-6s %-22s %6s %12s %12s %12s" % (
        "split", "tag", "n", "first", "last", "best"))
    for (split, tag), rs in sorted(by_tag.items()):
        rs.sort(key=lambda r: r["step"])
        vals = [r["value"] for r in rs]
        lower_is_better = "loss" in tag or "time" in tag
        best = min(vals) if lower_is_better else max(vals)
        print("%-6s %-22s %6d %12.5g %12.5g %12.5g" % (
            split, tag, len(vals), vals[0], vals[-1], best))


if __name__ == "__main__":
    main()
