"""Batch evaluation driver over a list of model names (reference:
testing/eval_models.py loops config/model_names.txt and shells out per mode).

    python -m ipoke_tpu.eval.eval_models -e fvd --names configs/model_names.txt
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-e", "--eval", default="fvd",
                    choices=["fvd", "accuracy", "diversity", "kps_acc", "samples"])
    ap.add_argument("--names", default="configs/model_names.txt")
    ap.add_argument("-c", "--config", default="configs/second_stage.yaml")
    ap.add_argument("--base_dir", default="logs")
    args = ap.parse_args()

    with open(args.names) as f:
        names = [l.strip() for l in f if l.strip() and not l.startswith("#")]
    results = {}
    for name in names:
        # process boundary per model, like the reference (fresh device state)
        cmd = [sys.executable, "main.py", "-c", args.config, "-m", name,
               "--test", args.eval, "--base_dir", args.base_dir]
        print(f"== {name}: {' '.join(cmd)}")
        proc = subprocess.run(cmd, capture_output=True, text=True)
        results[name] = {"returncode": proc.returncode, "tail": proc.stdout[-500:]}
        metrics = os.path.join(args.base_dir, "second_stage", "generated", name,
                               "metrics", f"{args.eval}.json")
        if os.path.exists(metrics):
            with open(metrics) as f:
                results[name]["metrics"] = json.load(f)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
