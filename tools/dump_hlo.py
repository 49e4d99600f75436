"""Dump the optimized HLO of the bench train step (with op metadata) to a file.

Lets profiler slice names (fusion.N, cond.N, sort.N...) be attributed to
python source ops: each HLO instruction carries metadata op_name/source_file.

Run: python tools/dump_hlo.py [batch_size] [out_path]
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    import jax

    import bench

    bs = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    out_path = sys.argv[2] if len(sys.argv) > 2 else "/tmp/step_hlo.txt"
    step, state, batches, _ = bench.build_bench(bs)
    compiled = step.lower(state, batches[0]).compile()
    txt = compiled.as_text()
    Path(out_path).write_text(txt)
    print(f"wrote {len(txt)} bytes to {out_path}")


if __name__ == "__main__":
    main()
