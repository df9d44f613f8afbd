"""nisqa_tpu: TPU-native (JAX/XLA/Pallas) speech-quality prediction framework.

A ground-up reimplementation of the capabilities of gabrielmittag/NISQA:
non-intrusive (single-ended) and full-reference (double-ended) speech quality
prediction (MOS + Noisiness/Coloration/Discontinuity/Loudness dimensions, and
TTS Naturalness), with training, evaluation, and weight-compatible loading of
the released PyTorch checkpoints.
"""

__version__ = "0.1.0"
