#!/usr/bin/env python
"""Summarize a jax.profiler xplane trace into committable text (op table).

The trainer's --profile-dir writes a TensorBoard-profile xplane; this turns
it into the screenshot-equivalent text receipt (SURVEY.md section 5
tracing/profiling; round-3 verdict item 7: prove the profiler works against
the relay backend, not just that the flag exists).

Usage: python scripts/profile_summary.py <profile_dir> [tool]
  tool: framework_op_stats (default) | op_profile | overview_page
"""
import glob
import os
import sys

os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")


def main():
    d = sys.argv[1] if len(sys.argv) > 1 else "results/profile_r4"
    tool = sys.argv[2] if len(sys.argv) > 2 else "framework_op_stats"
    paths = sorted(
        glob.glob(os.path.join(d, "**", "*.xplane.pb"), recursive=True)
    )
    if not paths:
        sys.exit(f"no *.xplane.pb under {d}")
    from xprof.convert import raw_to_tool_data as r

    data, _ = r.xspace_to_tool_data(paths, tool, {})
    if isinstance(data, bytes):
        data = data.decode("utf-8", "replace")
    print(f"# trace: {paths[-1]}")
    print(f"# tool: {tool}")
    if tool != "framework_op_stats":
        print(data)
        return
    # render the gviz JSON as a text op table (top 30 by total self-time)
    import json

    tables = json.loads(data)
    t = tables[0]
    cols = [c["id"] for c in t["cols"]]
    rows = [
        {c: (v or {}).get("v") for c, v in zip(cols, row["c"])}
        for row in t["rows"]
    ]
    dev = [r_ for r_ in rows if r_.get("host_or_device") == "Device"]
    dev.sort(key=lambda r_: -(r_.get("total_self_time") or 0))
    total = sum(r_.get("total_self_time") or 0 for r_ in dev)
    print(f"# device ops: {len(dev)}, total device self-time "
          f"{total/1e3:.1f} ms over the traced epoch")
    print(f"{'rank':>4} {'self-time':>12} {'%':>6} {'occ':>6}  operation")
    for i, r_ in enumerate(dev[:30], 1):
        st = r_.get("total_self_time") or 0
        print(
            f"{i:>4} {st/1e3:>10.2f}ms {100*st/total:>5.1f}% "
            f"{int(r_.get('occurrences') or 0):>6}  "
            f"{(r_.get('type') or '?')}: {(r_.get('operation') or '?')[:80]}"
        )


if __name__ == "__main__":
    main()
