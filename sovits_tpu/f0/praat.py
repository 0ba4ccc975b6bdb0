"""Praat-style autocorrelation pitch tracking (Boersma 1993) with Viterbi.

The reference's ``pm`` predictor wraps Praat's ``to_pitch_ac``
(modules/F0Predictor/PMF0Predictor.py:33-47: time_step=hop/sr,
voicing_threshold=0.6, pitch_floor=f0_min, pitch_ceiling=f0_max). This is an
independent implementation of the same published algorithm: window-
normalized autocorrelation candidates + octave/transition-cost Viterbi path.
"""

from __future__ import annotations

import numpy as np

from .base import F0Predictor


class ParselmouthF0Predictor(F0Predictor):
    name = "pm"

    voicing_threshold = 0.6
    silence_threshold = 0.03
    octave_cost = 0.01
    octave_jump_cost = 0.35
    voiced_unvoiced_cost = 0.14
    max_candidates = 15

    def raw_f0(self, wav: np.ndarray, p_len: int) -> np.ndarray:
        fs = float(self.sampling_rate)
        x = np.asarray(wav, dtype=np.float64)
        x = x - x.mean()
        global_peak = np.max(np.abs(x)) + 1e-12

        # Boersma: window of 3 longest periods
        frame_len = int(3.0 * fs / self.f0_min)
        frame_len += frame_len % 2
        hop = self.hop_length
        lag_min = max(int(fs / self.f0_max), 2)
        lag_max = int(fs / self.f0_min)

        window = np.hanning(frame_len)
        # autocorrelation of the window itself (for normalization)
        nfft = int(2 ** np.ceil(np.log2(2 * frame_len)))
        wf = np.fft.rfft(window, nfft)
        r_w = np.fft.irfft(wf * np.conj(wf))[: lag_max + 1]
        r_w /= r_w[0]

        pad = frame_len
        xp = np.pad(x, (0, pad))
        starts = np.arange(p_len) * hop
        idx = starts[:, None] + np.arange(frame_len)[None, :]
        idx = np.minimum(idx, len(xp) - 1)
        frames = xp[idx]
        local_peak = np.max(np.abs(frames), axis=1) + 1e-12
        frames = (frames - frames.mean(axis=1, keepdims=True)) * window[None, :]

        f = np.fft.rfft(frames, nfft, axis=1)
        r = np.fft.irfft(f * np.conj(f), axis=1)[:, : lag_max + 1]
        r = r / (r[:, :1] + 1e-12)
        r = r / r_w[None, :]  # normalized autocorrelation

        n_cand = self.max_candidates
        cand_f0 = np.zeros((p_len, n_cand))
        cand_str = np.zeros((p_len, n_cand))

        for i in range(p_len):
            ri = r[i]
            # local maxima within the lag range
            seg = ri[lag_min : lag_max - 1]
            mask = (seg > ri[lag_min - 1 : lag_max - 2]) & (seg >= ri[lag_min + 1 : lag_max])
            peaks = np.flatnonzero(mask) + lag_min
            if len(peaks):
                order = np.argsort(ri[peaks])[::-1][: n_cand - 1]
                peaks = peaks[order]
            strengths = []
            f0s = []
            for lag in peaks:
                denom = ri[lag - 1] - 2 * ri[lag] + ri[lag + 1]
                delta = 0.5 * (ri[lag - 1] - ri[lag + 1]) / (denom + 1e-12)
                delta = float(np.clip(delta, -1, 1))
                lag_ref = lag + delta
                val = float(np.clip(ri[lag], -1.0, 1.0))
                f0 = fs / lag_ref
                s = val - self.octave_cost * np.log2(self.f0_min * lag_ref / fs)
                f0s.append(f0)
                strengths.append(s)
            # unvoiced candidate strength (Boersma eq. 23)
            unvoiced_strength = self.voicing_threshold + max(
                0.0,
                2.0
                - (local_peak[i] / global_peak)
                / (self.silence_threshold / (1.0 + self.voicing_threshold)),
            )
            cand_f0[i, 0] = 0.0
            cand_str[i, 0] = unvoiced_strength
            for j, (f0, s) in enumerate(zip(f0s, strengths), start=1):
                if j >= n_cand:
                    break
                cand_f0[i, j] = f0
                cand_str[i, j] = s

        return self._viterbi(cand_f0, cand_str)

    def _viterbi(self, cand_f0: np.ndarray, cand_str: np.ndarray) -> np.ndarray:
        p_len, n_cand = cand_f0.shape
        cost = -cand_str[0]
        back = np.zeros((p_len, n_cand), dtype=np.int32)
        for t in range(1, p_len):
            f_prev = cand_f0[t - 1][:, None]  # [prev, 1]
            f_cur = cand_f0[t][None, :]  # [1, cur]
            both_v = (f_prev > 0) & (f_cur > 0)
            trans = np.where(
                both_v,
                self.octave_jump_cost
                * np.abs(np.log2((f_prev + 1e-12) / (f_cur + 1e-12))),
                np.where(
                    (f_prev > 0) != (f_cur > 0), self.voiced_unvoiced_cost, 0.0
                ),
            )
            total = cost[:, None] + trans - cand_str[t][None, :]
            back[t] = np.argmin(total, axis=0)
            cost = total[back[t], np.arange(n_cand)]
        path = np.zeros(p_len, dtype=np.int32)
        path[-1] = int(np.argmin(cost))
        for t in range(p_len - 2, -1, -1):
            path[t] = back[t + 1][path[t + 1]]
        return cand_f0[np.arange(p_len), path]
