#!/bin/bash
# Start the plant3dvision_tpu container (role of reference docker/run.sh:
# same flags incl. the smoke-test entries used by the CI docs,
# README.md:111-127).
set -e

vtag="latest"
cmd=''
mount_opts=()
db_path=""

usage() {
  cat <<EOF
Usage: $0 [-t tag] [-db /path/to/db] [-v host:cont] [-c "command"]
          [--geom_pipeline_test] [--ml_pipeline_test] [--tpu_test]
          [--optional_deps_test]

  -t           image tag (default: latest)
  -db          host database directory to mount at /myapp/db
  -v           extra volume mount (host:container), repeatable
  -c           command to run inside the container
  --geom_pipeline_test   run the geometric pipeline smoke test
  --ml_pipeline_test     run the ML pipeline smoke test
  --tpu_test             check that JAX sees the TPU
  --optional_deps_test   run the real dash/plotly smoke tests
EOF
}

while [ "$1" != "" ]; do
  case $1 in
    -t) shift; vtag=$1 ;;
    -db) shift; db_path=$1 ;;
    -v) shift; mount_opts+=("-v" "$1") ;;
    -c) shift; cmd=$1 ;;
    --geom_pipeline_test) cmd="cd plant3dvision_tpu && bash tests/check_geom_pipe.sh" ;;
    --ml_pipeline_test) cmd="cd plant3dvision_tpu && bash tests/check_ml_pipe.sh" ;;
    --tpu_test) cmd="python3 -c 'import jax; print(jax.devices())'" ;;
    --optional_deps_test) cmd="cd plant3dvision_tpu && python3 -m pytest tests/unit/test_optional_viz.py -v" ;;
    -h|--help) usage; exit 0 ;;
    *) usage; exit 1 ;;
  esac
  shift
done

[ -n "$db_path" ] && mount_opts+=("-v" "$db_path:/myapp/db")

if [ -n "$cmd" ]; then
  docker run --rm --privileged "${mount_opts[@]}" \
    plant3dvision_tpu:"$vtag" bash -c "$cmd"
else
  docker run --rm -it --privileged "${mount_opts[@]}" \
    plant3dvision_tpu:"$vtag"
fi
