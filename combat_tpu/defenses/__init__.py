"""Defense suite: STRIP, Neural Cleanse, fine-pruning, Grad-CAM, and the
frequency-based detector (train + trigger test) — reference ``defenses/``."""

from . import combine_images, fine_pruning, frequency, gradcam, neural_cleanse, strip  # noqa: F401
