#!/usr/bin/env python
"""Multi-host TPU launch wrapper.

The reference relies on torchrun + NCCL process groups (implied by its FSDP
utilities); the TPU-native equivalent is jax.distributed over ICI/DCN. Run
the SAME command on every host of the slice:

  python scripts/launch_multihost.py --coordinator <host0>:8476 \
      --num_processes 4 --process_id $WORKER_ID -- train.py --steps 1000 ...

On Cloud TPU VMs the coordinator/process args are auto-detected when omitted.
"""

import argparse
import runpy
import sys


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--coordinator", type=str, default=None)
    ap.add_argument("--num_processes", type=int, default=None)
    ap.add_argument("--process_id", type=int, default=None)
    ap.add_argument("script", type=str)
    ap.add_argument("script_args", nargs=argparse.REMAINDER)
    args = ap.parse_args()

    import jax

    jax.distributed.initialize(
        coordinator_address=args.coordinator,
        num_processes=args.num_processes,
        process_id=args.process_id,
    )
    print(
        f"process {jax.process_index()}/{jax.process_count()} "
        f"with {jax.local_device_count()} local / {jax.device_count()} global devices"
    )
    sys.argv = [args.script] + args.script_args
    runpy.run_path(args.script, run_name="__main__")


if __name__ == "__main__":
    main()
