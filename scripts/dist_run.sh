#!/usr/bin/env bash
# Multi-host training launch (reference dist_run.sh). One process per host;
# JAX uses all local TPU chips per process. For SLURM/GKE, coordinator
# discovery is automatic via jax.distributed.initialize (--multihost).
set -euo pipefail
CONFIG=${1:?train config yaml}
python -m cvd_tpu.cli.train --config "$CONFIG" --multihost
