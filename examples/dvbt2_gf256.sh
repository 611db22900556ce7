#!/bin/bash
# DVB-T2-size GF(256) R=1/2 sweep with the nm-compressed bf16 decoder.
python -m ems_nbldpc_tpu.cli --matrix Declercq_64800_R12_GF256 \
    --ebn0 1.4:2.0:0.2 --iters 10 --nm 32 --offset 0.3 \
    --storage compressed --dtype bfloat16 --batch 32 \
    --stop-errors 40 --out ./data
