"""Spatial audio engine.

TPU-native re-design of the reference audio layer (audio/AudioEngine.{h,cpp},
audio/AudioResampler.cpp, Resonance Audio spatialisation): all per-source DSP
(sample fetch with resampling, distance/occlusion attenuation, Doppler,
panning) and the N-source stereo downmix run as one fused jitted kernel per
256-frame block; the host pump thread keeps the same 4-block (~21.3 ms)
queue the reference's ResonanceThread maintains (AudioEngine.cpp:359-363).
"""

from substrata_tpu.audio.engine import AudioEngine, AudioSource  # noqa: F401
from substrata_tpu.audio.readers import read_wav, SoundFile  # noqa: F401
