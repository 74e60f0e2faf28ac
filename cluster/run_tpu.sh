#!/usr/bin/env bash
# TPU launch recipe — the TPU-world equivalent of the reference's SLURM
# scripts (/root/reference/cluster/run_style_gan_2d.sh).
#
# Single host (one chip / one pod slice visible to this VM):
#   python main.py --config iddiff/configs/dimension_estimation/ksphere.py \
#       --config_variant 10 --mode train
#
# Multi-host pod slice — one process per host, collectives ride ICI.
# Two ways to initialize (iddiff.parallel.maybe_initialize_distributed,
# called automatically by main.py / run_lib.train):
#
#   (a) TPU pod auto-detection: set config.training.num_nodes > 1 and run
#       the same command on every worker; jax.distributed.initialize()
#       discovers the cluster from the TPU metadata:
#         gcloud compute tpus tpu-vm ssh $TPU_NAME --worker=all --command \
#           "cd iddiff && python main.py --config <cfg> --mode train"
#
#   (b) explicit coordinator (non-TPU or custom clusters):
#         export JAX_COORDINATOR_ADDRESS=<host0-ip>:8476
#         export JAX_NUM_PROCESSES=<num_hosts>
#         export JAX_PROCESS_ID=<this_host_index>
#         python main.py --config <cfg> --mode train
#
# What the framework does per host (tests/test_multihost.py):
#   - config batch sizes are GLOBAL; each host loads batch/num_hosts samples
#     via EpochIterator(shard_index=process_index, num_shards=process_count)
#     over a shared seeded permutation (disjoint shards, lockstep counts);
#   - shard_batch assembles the global array with
#     jax.make_array_from_process_local_data; XLA inserts the gradient psum;
#   - metrics/TB write from process 0 only; orbax checkpoints collectively.
set -euo pipefail
python main.py "$@"
