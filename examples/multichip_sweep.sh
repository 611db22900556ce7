#!/bin/bash
# Frames sharded over 8 devices (ICI psum accounting). On a CPU host this
# exercises the same program on a virtual mesh:
#   JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8
python -m ems_nbldpc_tpu.cli --matrix Mat24_N48_M24 --ebn0 1.5:2.5:0.5 \
    --iters 10 --nm 16 --batch 512 --devices 8 --out ./data
