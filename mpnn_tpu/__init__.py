"""mpnn-tpu: a TPU-native framework for dynamically-routed image classifiers.

A ground-up JAX / XLA / pjit / Pallas rebuild with the capabilities of
MasonMcGill/multipath-nn (ICML 2017, "Deciding How to Decide: Dynamic Routing
in Artificial Neural Networks"): statically-routed (SR), actor (AC) and critic
(CR) networks over branching trees of multiscale convolutional blocks, trained
with a learned per-example accuracy-vs-compute tradeoff.

Key differences from the TF1 reference (see SURVEY.md for the full map):

- The whole training step -- batch sampling, augmentation, forward, routing
  probability propagation, loss, TALR-scaled momentum update -- is a single
  jitted XLA program. There are no host<->device feeds in the hot loop
  (the reference crosses per step: reference scripts/train-nets:141-143).
- Data-dependent routing is masked dense execution: every path runs every
  step, and per-example path probabilities (pi_tr / pi_ev) reweight losses
  and statistics, exactly like the reference's formulation
  (reference scripts/lib/net_types.py:108-131).
- Training/eval mode is a static Python bool producing two compiled programs
  instead of a string placeholder (reference scripts/lib/net_types.py:52).
- Parallelism is a first-class `jax.sharding.Mesh` with named `data` /
  `model` axes; batch sharding + XLA collectives replace the reference's
  single-device `tf.Session`.

Public surface mirrors the reference's: layer zoo (`mpnn_tpu.ops.layers`),
net types (`mpnn_tpu.models`), descriptor statistics (`mpnn_tpu.utils.desc`),
checkpoint serdes (`mpnn_tpu.utils.serdes`), experiment registry
(`mpnn_tpu.experiments`) and the `train-nets` / `train-adaptive-nets` /
`prep-data` CLIs under `scripts/`.
"""

__version__ = "0.1.0"
