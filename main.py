"""CLI entry point mirroring the reference surface (main.py):

  python main.py --config configs/second_stage.yaml --model_name my_model
  python main.py --config ... -m my_model --test samples
  python main.py --config ... -m my_model --resume

--gpus is accepted for surface parity; device selection on TPU is mesh-based
(all visible chips by default; IPOKE_N_DEVICES limits it).
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def parse_args():
    ap = argparse.ArgumentParser()
    ap.add_argument("-c", "--config", default="configs/second_stage.yaml")
    ap.add_argument("-m", "--model_name", required=True)
    ap.add_argument(
        "--test",
        default="none",
        choices=["none", "samples", "fvd", "accuracy", "diversity",
                 "control_sensitivity", "transfer", "kps_acc"],
    )
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--base_dir", default=None,
                    help="artifact root (default: config general.base_dir, else ./logs)")
    ap.add_argument("--gpus", nargs="+", type=int, default=None,
                    help="accepted for parity; TPU uses the device mesh")
    return ap.parse_args()


def main():
    args = parse_args()
    # honor JAX_PLATFORMS even under a sitecustomize that force-registers a
    # platform and overrides the env (NOTES.md): the config update must
    # happen after importing jax, before backend init
    if os.environ.get("JAX_PLATFORMS"):
        import jax

        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    from ipoke_tpu.config import load_parameters
    from ipoke_tpu.experiments import select_experiment

    config, dirs = load_parameters(
        args.config, args.model_name, base_dir=args.base_dir,
        restart=args.resume, test_mode=args.test,
    )
    experiment = select_experiment(config, dirs)
    if args.test != "none":
        result = experiment.test(args.test)
        print(result)
    else:
        experiment.train()


if __name__ == "__main__":
    main()
