"""Training data pipeline: (text, wav) corpus -> padded TrainBatch streams.

The reference has no data loader (inference only).  This one feeds the VITS
objective from an LJSpeech-layout corpus:

    corpus/
      metadata.csv          # id|transcript  (LJSpeech uses id|raw|normalized)
      wavs/<id>.wav         # 16-bit PCM mono at config.sampling_rate

Design: numpy-only host pipeline (no torch), linear spectrograms computed with
the same STFT the posterior encoder consumes (n_fft = 2*(spectrogram_bins-1),
hop = total_upsample so frames align 1:1 with latent frames), length-bucketed
shuffled batches with masks, audio padded to frames*total_upsample.  A worker
thread prefetches batches so host prep overlaps device steps.
"""

from __future__ import annotations

import csv
import os
import queue
import threading
from dataclasses import dataclass
from typing import Iterator, Optional, Sequence

import numpy as np

from vits_tpu.config import VitsConfig
from vits_tpu.text.tokenizer import VitsTokenizer
from vits_tpu.train.step import TrainBatch
from vits_tpu.utils.mel import hann_window
from vits_tpu.utils.wav import read_wav


def linear_spectrogram(audio: np.ndarray, n_fft: int, hop: int) -> np.ndarray:
    """|STFT| magnitude with VITS framing: reflect-pad (n_fft-hop)/2 per side,
    no centering — exactly T/hop frames so spectrogram frames align 1:1 with
    latent frames."""
    pad = (n_fft - hop) // 2
    x = np.pad(audio, (pad, pad), mode="reflect")
    n_frames = 1 + (len(x) - n_fft) // hop
    window = hann_window(n_fft)
    idx = np.arange(n_frames)[:, None] * hop + np.arange(n_fft)[None, :]
    frames = x[idx] * window
    return np.abs(np.fft.rfft(frames, axis=-1)).astype(np.float32)


@dataclass
class Utterance:
    utt_id: str
    text: str
    wav_path: str


def read_metadata(corpus_dir: str) -> list[Utterance]:
    path = os.path.join(corpus_dir, "metadata.csv")
    utts = []
    with open(path, encoding="utf-8") as f:
        for row in csv.reader(f, delimiter="|"):
            if not row:
                continue
            utt_id = row[0].strip()
            text = row[-1].strip()  # last column = normalized transcript
            wav = os.path.join(corpus_dir, "wavs", utt_id + ".wav")
            if os.path.exists(wav):
                utts.append(Utterance(utt_id, text, wav))
    return utts


class VitsDataset:
    def __init__(
        self,
        corpus_dir: str,
        tokenizer: VitsTokenizer,
        config: VitsConfig,
        max_frames: int = 400,
        min_frames: int = 8,
        use_native: Optional[bool] = None,
        num_workers: int = 0,
    ):
        self.tokenizer = tokenizer
        self.config = config
        self.n_fft = 2 * (config.spectrogram_bins - 1)
        self.hop = config.total_upsample
        self.max_frames = max_frames
        self.min_frames = min_frames
        self.utterances = read_metadata(corpus_dir)
        if not self.utterances:
            raise FileNotFoundError(f"no utterances found under {corpus_dir}")
        # Native fast path: C++ WAV decode + spectrogram (releases the GIL, so
        # num_workers threads decode in parallel).  Auto-on when the built
        # library has it and n_fft is a power of two (the C FFT's constraint).
        if use_native is None:
            from vits_tpu.io import native

            use_native = (
                native.loader_available()
                and self.n_fft & (self.n_fft - 1) == 0
            )
        self.use_native = bool(use_native)
        self.num_workers = max(0, int(num_workers))
        self._pool = None

    def __len__(self) -> int:
        return len(self.utterances)

    def load(self, utt: Utterance):
        """-> (token_ids, spectrogram (S, bins), audio (S*hop,)) or None."""
        if self.use_native:
            from vits_tpu.io import native

            audio, spec, rate = native.load_utterance(
                utt.wav_path, self.n_fft, self.hop, self.max_frames
            )
        else:
            audio, rate = read_wav(utt.wav_path)
        if rate != self.config.sampling_rate:
            raise ValueError(
                f"{utt.wav_path}: rate {rate} != config {self.config.sampling_rate}"
            )
        ids = self.tokenizer.encode(utt.text)
        n_frames = min(len(audio) // self.hop, self.max_frames)
        if n_frames < self.min_frames or not ids:
            return None
        if not self.use_native:
            audio = audio[: n_frames * self.hop]
            spec = linear_spectrogram(audio, self.n_fft, self.hop)[:n_frames]
        return np.asarray(ids, np.int32), spec, audio

    def _load_many(self, utts: Sequence[Utterance]) -> list:
        """Load a batch worth of utterances, dropping rejects; parallel when
        num_workers > 0 (worthwhile with the native loader — its C calls
        release the GIL)."""
        if self.num_workers > 0:
            if self._pool is None:
                from concurrent.futures import ThreadPoolExecutor

                self._pool = ThreadPoolExecutor(
                    max_workers=self.num_workers,
                    thread_name_prefix="vits-data",
                )
            results = list(self._pool.map(self.load, utts))
        else:
            results = [self.load(u) for u in utts]
        return [r for r in results if r is not None]

    def batches(
        self,
        batch_size: int,
        rng: np.random.Generator,
        epochs: Optional[int] = None,
        bucket_mult: int = 32,
    ) -> Iterator[TrainBatch]:
        """Shuffled, length-bucketed padded batches; loops `epochs` times (None=forever)."""
        epoch = 0
        while epochs is None or epoch < epochs:
            order = rng.permutation(len(self.utterances))
            # sort within large shuffled chunks by audio length to reduce padding
            chunk = batch_size * 16
            for start in range(0, len(order), chunk):
                idxs = sorted(
                    order[start : start + chunk],
                    key=lambda i: os.path.getsize(self.utterances[i].wav_path),
                )
                for b0 in range(0, len(idxs), batch_size):
                    items = self._load_many(
                        [self.utterances[i] for i in idxs[b0 : b0 + batch_size]]
                    )
                    if not items:
                        continue
                    yield self._collate(items, bucket_mult)
            epoch += 1

    def _collate(self, items, bucket_mult: int) -> TrainBatch:
        B = len(items)
        t_max = max(len(ids) for ids, _, _ in items)
        s_max = max(spec.shape[0] for _, spec, _ in items)
        t_pad = ((t_max + bucket_mult - 1) // bucket_mult) * bucket_mult
        s_pad = ((s_max + bucket_mult - 1) // bucket_mult) * bucket_mult

        input_ids = np.zeros((B, t_pad), np.int32)
        token_mask = np.zeros((B, t_pad), np.float32)
        spec = np.zeros((B, s_pad, self.config.spectrogram_bins), np.float32)
        frame_mask = np.zeros((B, s_pad), np.float32)
        audio = np.zeros((B, s_pad * self.hop), np.float32)
        for b, (ids, sp, au) in enumerate(items):
            input_ids[b, : len(ids)] = ids
            token_mask[b, : len(ids)] = 1.0
            spec[b, : sp.shape[0]] = sp
            frame_mask[b, : sp.shape[0]] = 1.0
            audio[b, : len(au)] = au
        return TrainBatch(
            input_ids=input_ids,
            token_mask=token_mask,
            spectrogram=spec,
            frame_mask=frame_mask,
            audio=audio,
        )


class Prefetcher:
    """Background-thread batch prefetch (host prep overlaps device compute).

    ``close()`` releases the worker even when the consumer stops early — the
    train loop takes exactly ``steps`` batches from an infinite epoch
    iterator, so without it the producer stays blocked on the full queue
    (holding the dataset iterator and its buffers) for the life of the
    process, one leaked thread per ``train()`` call.
    """

    def __init__(self, iterator: Iterator, depth: int = 2):
        self._queue: "queue.Queue" = queue.Queue(maxsize=depth)
        self._done = object()
        self._stopped = threading.Event()
        self._thread = threading.Thread(
            target=self._fill, args=(iterator,), daemon=True
        )
        self._thread.start()

    def _put(self, item) -> bool:
        """Blocking put that aborts (returns False) once close() is called."""
        while not self._stopped.is_set():
            try:
                self._queue.put(item, timeout=0.2)
                return True
            except queue.Full:
                continue
        return False

    def _fill(self, iterator):
        items = iter(iterator)
        while True:
            try:
                item = next(items)
            except StopIteration:
                self._put(self._done)
                return
            except BaseException:
                # Keep the consumer from hanging on a dead producer, then
                # re-raise so the thread's excepthook reports the real error.
                self._put(self._done)
                raise
            if not self._put(item):
                return  # closed mid-stream; consumer is gone

    def close(self, timeout: float = 5.0) -> None:
        """Stop the producer thread (idempotent; safe mid-iteration)."""
        self._stopped.set()
        if self._thread.is_alive():
            self._thread.join(timeout)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def __iter__(self):
        return self

    def __next__(self):
        item = self._queue.get()
        if item is self._done:
            raise StopIteration
        return item
