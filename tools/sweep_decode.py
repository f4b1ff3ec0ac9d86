"""Sweep the decode-scan knobs on hardware: rice-scan row window width
(FRTPU_DECODE_NROW) x IIR restore unroll (FRTPU_IIR_UNROLL).

Both are trace-time constants read at module import, so every combo runs
in a fresh subprocess (tools/profile_decode.py with FRTPU_FIXTURE=device)
and this driver parses the per-chunk frame-decode line.  Run on a QUIET
box (no concurrent pytest -- the relay threads share the single CPU).

Usage: python tools/sweep_decode.py [frames] [chunk]
"""

from __future__ import annotations

import os
import pathlib
import re
import subprocess
import sys

HERE = pathlib.Path(__file__).resolve().parent

NROWS = (2, 3, 4)
UNROLLS = (8, 16)


def main() -> int:
    frames = sys.argv[1] if len(sys.argv) > 1 else "2048"
    chunk = sys.argv[2] if len(sys.argv) > 2 else "2048"
    pat = re.compile(r"decode_frames_device \(row \):\s+([0-9.]+) ms/chunk\s+([0-9.]+) MB/s")
    e2e_pat = re.compile(r"e2e decode_flac_device\s+:\s+([0-9.]+) ms\s+([0-9.]+) MB/s")
    print(f"sweep: frames={frames} chunk={chunk}  (row-mode frame decode per combo)")
    results = []
    for nrow in NROWS:
        for unroll in UNROLLS:
            env = dict(os.environ)
            env.update(
                FRTPU_DECODE_NROW=str(nrow),
                FRTPU_IIR_UNROLL=str(unroll),
                FRTPU_FIXTURE="device",
            )
            try:
                out = subprocess.run(
                    [sys.executable, str(HERE / "profile_decode.py"), frames, chunk],
                    env=env, capture_output=True, text=True, timeout=2400,
                ).stdout
            except subprocess.TimeoutExpired:
                print(f"NROW={nrow} UNROLL={unroll}: TIMEOUT")
                continue
            m, me = pat.search(out), e2e_pat.search(out)
            if m:
                results.append((float(m.group(1)), nrow, unroll))
                e2e = f"  e2e {me.group(2)} MB/s" if me else ""
                print(f"NROW={nrow} UNROLL={unroll}: {m.group(1)} ms/chunk "
                      f"{m.group(2)} MB/s raw{e2e}", flush=True)
            else:
                tail = "\n".join(out.splitlines()[-4:])
                print(f"NROW={nrow} UNROLL={unroll}: NO PARSE\n{tail}", flush=True)
    if results:
        best = min(results)
        print(f"best: NROW={best[1]} UNROLL={best[2]} at {best[0]} ms/chunk")
    return 0


if __name__ == "__main__":
    sys.exit(main())
