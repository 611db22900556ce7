#!/bin/bash
# The reference's start.sh sweep (start.sh:5-22), in-process: one command
# instead of one forked xterm per SNR point.
python -m ems_nbldpc_tpu.cli 2000000 10 KN/N576_K480_GF64.txt 3.0:5.0:0.5 \
    30 0.3 45 --batch 4096 --stop-errors 40 --out ./data
