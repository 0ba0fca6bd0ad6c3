"""audiality2-tpu: a TPU-native rebuild of the Audiality 2 realtime
audio and music engine.

The A2S scripting language, VM, and subsample-accurate control plane
are behavioral mirrors of the reference engine (olofson/audiality2);
the DSP runs either on the host (numpy, bit-exact integer reference)
or voice-batched on TPU via JAX/Pallas (audiality2_tpu.tpu).
"""

from .engine.state import open_engine, Config, State, Interface
from .errors import A2Error, A2Exception, A2CompileError
from .constants import WaveType, SampleFormat

__version__ = "0.1.0"
