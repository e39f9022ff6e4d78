"""tpu-vits: a TPU-native (JAX/XLA/Pallas) text-to-speech engine.

A from-scratch rebuild of the capabilities of maxilevi/vits.cpp (CPU/ggml) as a
single-jit, static-shape, batchable TPU program.  Public API mirrors the
reference's C ABI surface (/root/reference/src/include/vits.h:87-102):

    model = vits_tpu.load_model("vits-english.ggml")   # or an HF name/dir
    audio = model.synthesize("hello world")            # float32 PCM @ 16 kHz
"""

from vits_tpu.config import EngineConfig, VitsConfig

__version__ = "0.1.0"

__all__ = [
    "VitsConfig",
    "EngineConfig",
    "load_model",
    "__version__",
]


def load_model(source, engine_config=None, **kwargs):
    """Load a VITS model from a .ggml path/bytes or an HF name/directory.

    Returns a :class:`vits_tpu.engine.synthesizer.Synthesizer`.
    """
    from vits_tpu.engine.synthesizer import Synthesizer

    return Synthesizer.load(source, engine_config=engine_config, **kwargs)
