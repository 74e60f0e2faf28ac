#!/usr/bin/env bash
# TPU launch recipe — the TPU-world equivalent of the reference's SLURM
# scripts (/root/reference/cluster/run_style_gan_2d.sh).
#
# Single host (one chip / one pod slice visible to this VM):
#   python main.py --config iddiff/configs/dimension_estimation/ksphere.py \
#       --config_variant 10 --mode train
#
# Multi-host pod slice (one process per host; JAX collectives ride ICI):
#   export JAX_COORDINATOR_ADDRESS=<host0-ip>:8476
#   export JAX_NUM_PROCESSES=<num_hosts>
#   export JAX_PROCESS_ID=<this_host_index>
#   python main.py --config <cfg> --mode train
# (iddiff.parallel.maybe_initialize_distributed picks these up; per-host
# data sharding via EpochIterator shard_index/num_shards.)
#
# gcloud example (v5e-16):
#   gcloud compute tpus tpu-vm ssh $TPU_NAME --worker=all --command \
#     "cd iddiff && JAX_COORDINATOR_ADDRESS=... python main.py --config ... --mode train"
set -euo pipefail
python main.py "$@"
