#!/usr/bin/env bash
# Multi-host training launcher — the TPU-native role of the reference's
# SLURM scripts (/root/reference/slurm_scripts/ffs.slurm).
#
# Three modes:
#
# 1) TPU pod slice (the production path). On Cloud TPU VMs JAX discovers
#    the slice topology itself (jax.distributed.initialize() with no args —
#    latte_tpu calls it when num_processes is set; on TPU pods you can also
#    simply omit the coordinator keys entirely and run one process per
#    host). Launch the same command on every worker:
#
#      ./scripts/launch_multihost.sh pod <tpu-name> <zone> configs/ffs/ffs_train.yaml
#
#    which runs, via gcloud on all workers:
#      python -m latte_tpu.train.train --config <cfg>
#
# 2) Explicit coordinator (GCE VMs / bare metal, the SLURM-style path):
#    run on EACH host, with HOST_I / NUM_HOSTS / COORD set:
#
#      COORD=10.0.0.2:8476 NUM_HOSTS=4 HOST_I=0 \
#        ./scripts/launch_multihost.sh host configs/ffs/ffs_train.yaml
#
# 3) Local CPU simulation (N processes on this machine; what
#    tests/test_multihost.py automates — use to validate a config's
#    multi-process behavior without a pod):
#
#      ./scripts/launch_multihost.sh sim 2 configs/ffs/ffs_train.yaml
set -euo pipefail

mode="${1:?usage: launch_multihost.sh pod|host|sim ...}"
shift

case "$mode" in
  pod)
    tpu_name="${1:?tpu name}"; zone="${2:?zone}"; cfg="${3:?config yaml}"; shift 3
    exec gcloud compute tpus tpu-vm ssh "$tpu_name" --zone "$zone" --worker=all \
      --command "cd $(pwd) && python -m latte_tpu.train.train --config $cfg $*"
    ;;
  host)
    cfg="${1:?config yaml}"; shift
    : "${COORD:?set COORD=<coordinator-ip:port>}"
    : "${NUM_HOSTS:?set NUM_HOSTS}"
    : "${HOST_I:?set HOST_I (0-based)}"
    exec python -m latte_tpu.train.train --config "$cfg" \
      coordinator_address="$COORD" num_processes="$NUM_HOSTS" process_id="$HOST_I" "$@"
    ;;
  sim)
    n="${1:?num processes}"; cfg="${2:?config yaml}"; shift 2
    port=$(( 20000 + RANDOM % 20000 ))
    pids=()
    for i in $(seq 0 $((n - 1))); do
      JAX_PLATFORMS=cpu \
      XLA_FLAGS="${XLA_FLAGS:-} --xla_force_host_platform_device_count=2" \
      python -m latte_tpu.train.train --config "$cfg" \
        coordinator_address="127.0.0.1:$port" num_processes="$n" process_id="$i" "$@" \
        2>&1 | sed "s/^/[proc $i] /" &
      pids+=($!)
    done
    rc=0
    for p in "${pids[@]}"; do wait "$p" || rc=$?; done
    exit "$rc"
    ;;
  *)
    echo "unknown mode $mode (pod|host|sim)" >&2; exit 2
    ;;
esac
