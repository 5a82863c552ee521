"""MP3 streaming into streaming audio sources.

StreamerThread parity (audio/StreamerThread.{h,cpp}): one shared MP3
decoder per file path fans decoded PCM out to every attached streaming
source, keeping at least TARGET_BUFFERED samples (~92 ms at 48 kHz,
StreamerThread.cpp:55-57) queued per source, decoding at most a few
chunks per pump iteration so one long file cannot starve the others.
Looping streams rewind the decoder at EOF.
"""

from __future__ import annotations

import threading
import time

import numpy as np

from substrata_tpu.runtime import codecs

TARGET_BUFFERED = 4096      # samples (~92 ms at 44.1k; StreamerThread.cpp:55)
MAX_CHUNKS_PER_ITER = 4     # StreamerThread.cpp: <= 4 frames per iteration
CHUNK_FRAMES = 1152         # one MPEG layer-III granule pair


class _Stream:
    def __init__(self, path: str, loop: bool):
        self.path = path
        self.loop = loop
        self.decoder = codecs.Mp3Streamer(path)
        self.sources = []        # attached streaming AudioSources
        self.buffered = 0.0      # engine-side estimate of queued samples
        self.finished = False


class AudioStreamer:
    """Decodes shared MP3 streams into attached sources' ring buffers.

    Used by the engine for streamed audio objects; drive via ``pump()``
    from the engine's pump thread, or ``start()`` for a standalone thread.
    """

    def __init__(self, engine):
        self.engine = engine
        self.streams: dict[str, _Stream] = {}
        self._lock = threading.Lock()
        self._running = False
        self._thread = None

    def attach(self, path: str, source, loop: bool = True):
        """Attach a streaming source to the shared stream for ``path``
        (shared MP3AudioStreamer map parity, AudioEngine.h:255-257)."""
        with self._lock:
            st = self.streams.get(path)
            if st is None:
                st = self.streams[path] = _Stream(path, loop)
            st.sources.append(source)
        return st

    def detach(self, source):
        with self._lock:
            for path in list(self.streams):
                st = self.streams[path]
                st.sources = [s for s in st.sources if s is not source]
                if not st.sources:
                    st.decoder.close()
                    del self.streams[path]

    def pump(self):
        """Decode up to MAX_CHUNKS_PER_ITER chunks per stream and push to
        all attached sources until each has TARGET_BUFFERED queued."""
        with self._lock:
            streams = list(self.streams.values())
        for st in streams:
            if st.finished and not st.loop:
                continue
            # Engine read-head estimate: samples consumed since last pump.
            for _ in range(MAX_CHUNKS_PER_ITER):
                if st.buffered >= TARGET_BUFFERED:
                    break
                pcm = st.decoder.read(CHUNK_FRAMES)
                if st.decoder.eof:
                    if st.loop:
                        st.decoder.close()
                        st.decoder = codecs.Mp3Streamer(st.path)
                    else:
                        st.finished = True
                if len(pcm) == 0:
                    if st.finished:
                        break
                    continue
                mono = pcm if pcm.ndim == 1 else pcm.mean(axis=1)
                from substrata_tpu.audio.mix import ENGINE_RATE
                if st.decoder.sample_rate != ENGINE_RATE:
                    from substrata_tpu.audio.resampler import resample
                    mono = resample(mono, st.decoder.sample_rate, ENGINE_RATE)
                for src in st.sources:
                    self.engine.stream_samples(src, mono.astype(np.float32))
                st.buffered += len(mono)

    def consume(self, n_samples: float):
        """Advance the read-head estimate (called per mixed block)."""
        with self._lock:
            for st in self.streams.values():
                st.buffered = max(0.0, st.buffered - n_samples)

    def start(self, period: float = 0.01):
        self._running = True

        from substrata_tpu.audio.mix import ENGINE_RATE

        def loop():
            while self._running:
                self.pump()
                self.consume(ENGINE_RATE * period)
                time.sleep(period)

        self._thread = threading.Thread(target=loop, daemon=True)
        self._thread.start()

    def stop(self):
        self._running = False
        if self._thread:
            self._thread.join(timeout=1.0)
        with self._lock:
            for st in self.streams.values():
                st.decoder.close()
            self.streams.clear()
