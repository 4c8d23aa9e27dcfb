#!/usr/bin/env bash
# Cloud-VM cost control: run the grid sweep then halt
# (reference train_and_shutdown.sh:2-3).
set -e
python "$(dirname "$0")/train_vae_hyperbolic_mnist_grid.py" "$@" && sudo shutdown -h now
