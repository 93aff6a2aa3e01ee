"""Dump a train-time F0 cache (.pit.npy) to the human-editable CSV format.

Equivalent of the reference's `pitch/debug.py`: loads a pitch npy and writes
`pitch_debug.csv` rows "Xm Ys Zms,f0" (same format `svc_inference.py --pit`
accepts), so train-time pitch caches can be inspected/edited in a spreadsheet.
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from whisper_vits_svc_tpu.infer.pipeline import save_csv_pitch  # noqa: E402


def main(argv=None):
    p = argparse.ArgumentParser(prog="pitch_debug")
    p.add_argument("-p", "--pit", required=True, help="path to .pit.npy")
    p.add_argument("-o", "--out", default="pitch_debug.csv")
    args = p.parse_args(argv)
    pitch = np.load(args.pit)
    save_csv_pitch(pitch, args.out)
    print(f"wrote {args.out} ({len(pitch)} frames)")


if __name__ == "__main__":
    main()
