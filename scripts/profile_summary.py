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
    print(data)


if __name__ == "__main__":
    main()
