"""Regenerate README.md's benchmark table from a bench artifact.

ADVICE r3: the README table must always match a STORED artifact (round 3
synced it to an intermediate run whose JSON was overwritten, leaving a
2.5x contradiction on the ClipOCR row).  This renders the table between
the BENCH_TABLE markers in README.md directly from a bench.py JSON line,
so claims and evidence cannot diverge.

Usage: python tools/gen_readme_table.py BENCH_rXX.json [--readme README.md]
"""

import argparse
import json
import re
import sys
from pathlib import Path

BEGIN = "<!-- BENCH_TABLE_BEGIN"
END = "<!-- BENCH_TABLE_END -->"


def fmt(x, nd=1):
    return f"{x:.{nd}f}" if isinstance(x, (int, float)) else "n/a"


def pct(x):
    return f"{100 * x:.1f}%" if isinstance(x, (int, float)) else "n/a"


def render(d: dict) -> str:
    rows = []

    def row(name, result):
        rows.append(f"| {name} | {result} |")

    row("TCB-PSP R101 streaming inference, 64 distinct frames/scan",
        f"**{fmt(d.get('value'))} target-frames/sec/chip at "
        f"{pct(d.get('mfu'))} MFU** — {fmt(d.get('vs_baseline'), 2)}× the "
        "measured reference eval-loop formulation (test_clip2.py re-encodes "
        "the 4-frame window per frame) on the same model/chip/dtype "
        f"({fmt(d.get('baseline_frames_per_sec'))} f/s at "
        f"{pct(d.get('baseline_mfu'))})")
    if d.get("stream_bucketed_frames_per_sec"):
        row("… production width-bucketed masked path (480×853 in the "
            "480×896 bucket, runtime-valid scalars)",
            f"{fmt(d['stream_bucketed_frames_per_sec'])} frames/sec "
            f"({fmt(d.get('stream_bucketed_overhead_pct'))}% overhead vs "
            "the exact-shape kernel)")
    if d.get("stream4_frames_per_sec"):
        row("Multi-stream serving (4 independent videos batched through "
            "the per-frame step)",
            f"{fmt(d['stream4_frames_per_sec'])} frames/sec/chip")
    if d.get("int8_stream_frames_per_sec"):
        row("… opt-in int8 quantized serving (`--serve_dtype int8`: wide "
            "spatial convs s8×s8→s32, dynamic activations — an accuracy "
            "trade, ops/quant.py)",
            f"{fmt(d['int8_stream_frames_per_sec'])} frames/sec "
            f"({fmt(d.get('int8_speedup'), 2)}× the bf16 row)")
    row("TCB-PSP R101 training step, 4-frame clip, per-chip batch 2 "
        "(the reference's per-GPU batch)",
        f"**{fmt(d.get('train_step_ms'))} ms/step at "
        f"{pct(d.get('train_mfu'))} MFU** (fwd+bwd+SGD+BN stats, 8 donated "
        "chained steps / 1 readback — the production dispatch pattern; "
        f"{fmt(d.get('train_step_single_readback_ms'))} ms with a per-step "
        "scalar readback through the tunnel)")
    ocr_extra = ""
    if d.get("clipocr_bucketed_frames_per_sec"):
        ocr_extra = (f"; bucketed {fmt(d['clipocr_bucketed_frames_per_sec'])}"
                     f" ({fmt(d.get('clipocr_bucketed_overhead_pct'))}% "
                     "overhead)")
    row("ClipOCR (TCB-OCR) streaming inference",
        f"{fmt(d.get('clipocr_frames_per_sec'))} frames/sec at "
        f"{pct(d.get('clipocr_mfu'))} MFU; 4-stream "
        f"{fmt(d.get('clipocr_stream4_frames_per_sec'))}{ocr_extra}")
    td_extra = ""
    if d.get("tdnet_bucketed_frames_per_sec"):
        td_extra = (f"; bucketed {fmt(d['tdnet_bucketed_frames_per_sec'])} "
                    f"({fmt(d.get('tdnet_bucketed_overhead_pct'))}% "
                    "overhead)")
    row("TDNet (td4_psp) streaming (K/V/Q carry, one scan over 4-frame "
        "blocks)",
        f"{fmt(d.get('tdnet_frames_per_sec'))} frames/sec; 4-stream "
        f"{fmt(d.get('tdnet_stream4_frames_per_sec'))}{td_extra}")
    etc_extra = ""
    if d.get("etc_bucketed_windows_per_sec"):
        etc_extra = (f"; bucketed {fmt(d['etc_bucketed_windows_per_sec'])}")
    row("ETC window inference",
        f"{fmt(d.get('etc_windows_per_sec'))} windows/sec at "
        f"{pct(d.get('etc_mfu'))} MFU{etc_extra}")
    if d.get("netwarp_stream_frames_per_sec"):
        nw_extra = ""
        if d.get("netwarp_stream_bucketed_frames_per_sec"):
            nw_extra = (f"; bucketed "
                        f"{fmt(d['netwarp_stream_bucketed_frames_per_sec'])}")
        row("NetWarp streaming inference (encode target + 20-iter RAFT, "
            "cached prev features)",
            f"{fmt(d['netwarp_stream_frames_per_sec'])} frames/sec at "
            f"{pct(d.get('netwarp_stream_mfu'))} MFU{nw_extra}")
    nw_mfu = (f" at {pct(d['netwarp_train_mfu'])} MFU"
              if d.get("netwarp_train_mfu") else "")
    row("NetWarp training step (frozen 20-iter RAFT + R101 + warps), "
        "479² pair",
        f"**{fmt(d.get('netwarp_train_step_ms'))} ms/step**{nw_mfu} per chip")
    if d.get("etc_train_step_ms"):
        row("ETC training step (clip + ST-MSE temporal loss), 479²",
            f"{fmt(d['etc_train_step_ms'])} ms/step at "
            f"{pct(d.get('etc_train_mfu'))} MFU")
    if d.get("eval_policy_exact_mix_fps"):
        row("Eval-shape policy on the 704+853 width mix (steady state)",
            f"exact kernels {fmt(d['eval_policy_exact_mix_fps'])} frames/sec "
            f"vs bucketed {fmt(d.get('eval_policy_bucketed_mix_fps'))} — "
            "`--eval_policy auto` routes amortizing shapes to exact "
            "(compile amortization: tools/eval_policy_micro.py)")
    wm = [(n, d.get(f"{n}_windows_per_sec"), d.get(f"{n}_mfu"))
          for n in ("our_warp", "propnet", "our_warp_merge", "nonlocal3d")]
    wm = [(n, v, m) for n, v, m in wm if v]
    if wm:
        row("Remaining `--method` window-eval surfaces (R101, 480×853)",
            "; ".join(f"{n} {fmt(v)} windows/sec"
                      + (f" at {pct(m)} MFU" if m else "")
                      for n, v, m in wm))
    row("OCR-head microbench (reference's own harness shape, "
        "spatial_ocr_block.py:502-517)",
        f"{fmt(d.get('ocr_head_ms'))} ms")
    if d.get("host_decode_frames_per_sec"):
        row("Host input pipeline (libjpeg pool decode + fused normalize "
            "at 480p, this machine's cores)",
            f"{fmt(d['host_decode_frames_per_sec'])} frames/sec — "
            f"~{d.get('host_cores_to_saturate_chip', 'n/a')} host core(s) "
            "saturate one chip's streaming rate (single-thread "
            "extrapolation)")
    spreads = d.get("spreads_pct") or {}
    maxspread = max(spreads.values()) if spreads else None
    note = (f"\n(Cross-trial wall-time spread ≤ {fmt(maxspread)}% on the "
            "serving rows of this run; artifact: see `spreads_pct`.)"
            if maxspread is not None else "")
    return "\n".join(rows) + note


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("artifact")
    ap.add_argument("--readme", default=str(
        Path(__file__).resolve().parent.parent / "README.md"))
    ap.add_argument("--force", action="store_true",
                    help="publish despite a drift-gate failure")
    args = ap.parse_args()

    with open(args.artifact) as f:
        text = f.read()
    # accept either a raw JSON line or the driver's wrapper {"parsed": ...}
    d = json.loads(text)
    if "parsed" in d and isinstance(d["parsed"], dict):
        d = d["parsed"]

    # drift gate (VERDICT r4 #7): refuse to publish a table whose serving
    # rows moved more vs the previous archived run than this run's own
    # trial spread explains (+2% floor) — run-to-run regime shifts must be
    # investigated, not silently enshrined in README.
    drifts = d.get("drift_vs_prev_pct") or {}
    spreads = d.get("spreads_pct") or {}
    maxspread = max(spreads.values(), default=0.0)
    allowed = max(maxspread, 2.0) + 2.0
    bad = {k: v for k, v in drifts.items() if abs(v) > allowed}
    if bad and not args.force:
        sys.exit(f"drift vs {d.get('drift_prev_artifact')} exceeds the "
                 f"spread-explained band (±{allowed:.1f}%): {bad} — "
                 "investigate the regime shift or rerun; --force overrides")

    readme = Path(args.readme).read_text()
    if BEGIN not in readme or END not in readme:
        sys.exit("README has no BENCH_TABLE markers")
    head = (f"{BEGIN} (generated by tools/gen_readme_table.py from "
            f"{Path(args.artifact).name}; do not edit by hand) -->\n")
    body = ("| Workload | Result |\n|---|---|\n" + render(d) + "\n")
    new = re.sub(re.escape(BEGIN) + r".*?" + re.escape(END),
                 head + body + END, readme, flags=re.S)
    Path(args.readme).write_text(new)
    print(f"README table regenerated from {args.artifact}")


if __name__ == "__main__":
    main()
