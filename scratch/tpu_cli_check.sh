#!/bin/bash
# Full drift-makeproducts run on the real chip (production path, QR engine)
set -e
rm -rf /tmp/tpu_prod
mkdir -p /tmp/tpu_prod
cat > /tmp/tpu_prod/params.yaml <<'YAML'
config:
    beamtransfers:      Yes
    kltransform:        Yes
    psfisher:           Yes
    output_directory:   "/tmp/tpu_prod/testdir"
telescope:
    type:               PolarisedCylinder
    num_freq:           4
    freq_start:         100.0
    freq_end:           110.0
    freq_mode:          edge
    num_cylinders:      2
    cylinder_width:     2.0
    num_feeds:          2
    feed_spacing:       1.5
    tsys:               1.0
    single_precision:   Yes
kltransform:
    -   type:           KLTransform
        name:           kl
    -   type:           DoubleKL
        name:           dk
psfisher:
    -   type:           MonteCarlo
        name:           ps1
        klname:         kl
        nsamples:       50
        seed:           1
        k_bands:
        -   spacing:    linear
            start:      0.0
            stop:       0.25
            num:        3
YAML
cd /root/repo
python -m driftscan_tpu.scripts.makeproducts run /tmp/tpu_prod/params.yaml
