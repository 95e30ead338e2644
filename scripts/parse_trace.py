"""Parse a jax.profiler trace capture into a per-op time table.

Usage: python scripts/parse_trace.py /tmp/bench_trace [top_n]

Uses the in-image xprof converter (CLAUDE.md: the only reliable way to
attribute step time on the remote-TPU relay).  hlo_stats returns a gviz
DataTable JSON; we aggregate total self time by op and by category.
"""
import glob
import json
import sys
from collections import defaultdict


def _source_key(row, ids):
    """Leaf repo frame from the source_info cell → 'file.py:line'."""
    import re
    i_src = ids.index("source_info")
    cell = row["c"][i_src]["v"] or ""
    m = re.search(r"title='([^']*)'", cell)
    frames = (m.group(1).split("\n") if m else [])
    for fr in frames:
        if "/ibgs_tpu/" in fr or "/scripts/" in fr:
            return fr.strip().replace("/root/repo/", "")
    return frames[0].strip().replace("/root/repo/", "") if frames else "?"


def main():
    trace_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/bench_trace"
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    # divide every number by this to get per-step time (bench chains
    # BENCH_ITERS=5 steps inside one jit)
    steps = float(sys.argv[3]) if len(sys.argv) > 3 else 1.0
    paths = sorted(glob.glob(trace_dir + "/**/*.xplane.pb", recursive=True))
    if not paths:
        print("no xplane.pb under", trace_dir)
        return
    from xprof.convert import raw_to_tool_data as rtd
    data, _ = rtd.xspace_to_tool_data([paths[-1]], "hlo_stats", {})
    if isinstance(data, bytes):
        data = data.decode()
    tbl = json.loads(data)
    ids = [c["id"] for c in tbl["cols"]]
    i_cat = ids.index("category")
    i_name = ids.index("hlo_op_name")
    i_time = ids.index("total_self_time")
    i_occ = ids.index("occurrences")
    agg = defaultdict(float)
    occ = defaultdict(int)
    cat = defaultdict(float)
    src = defaultdict(float)
    src_ops = defaultdict(int)
    for row in tbl["rows"]:
        c = row["c"]
        t = (c[i_time]["v"] or 0.0) / steps
        agg[c[i_name]["v"]] += t
        occ[c[i_name]["v"]] += int(c[i_occ]["v"] or 0)
        cat[c[i_cat]["v"]] += t
        src[_source_key(row, ids)] += t
        src_ops[_source_key(row, ids)] += 1
    total = sum(agg.values())
    print(f"total device self time: {total/1e3:.2f} ms ({len(agg)} ops)"
          + (f"  [per step: /{steps:g}]" if steps != 1 else ""))
    print("--- by category ---")
    for k, v in sorted(cat.items(), key=lambda kv: -kv[1])[:15]:
        print(f"{v/1e3:9.2f} ms  {100*v/total:5.1f}%  {k}")
    print(f"--- top {top_n} ops by total self time ---")
    for k, v in sorted(agg.items(), key=lambda kv: -kv[1])[:top_n]:
        print(f"{v/1e3:9.2f} ms  {100*v/total:5.1f}%  x{occ[k]:<4d} {k[:120]}")
    print(f"--- top {top_n} SOURCE LINES by total self time ---")
    for k, v in sorted(src.items(), key=lambda kv: -kv[1])[:top_n]:
        print(f"{v/1e3:9.2f} ms  {100*v/total:5.1f}%  "
              f"[{src_ops[k]:>3d} ops] {k[:110]}")


if __name__ == "__main__":
    main()
