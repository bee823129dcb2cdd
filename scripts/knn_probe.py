"""Probe-driven scalar model of cv2 BackgroundSubtractorKNN."""
import math

import cv2
import numpy as np


class P:
    nN = 7
    kNN = 2
    Tb = 400.0
    history = 50


class Model:
    def __init__(self, p=P):
        self.p = p
        n = p.nN
        # 3 banks: short, mid, long — samples (3,) + flag
        self.samples = np.zeros((3, n, 3), np.float32)
        self.flags = np.zeros((3, n), bool)
        self.used = np.zeros((3, n), bool)  # slot ever written
        self.idx = [0, 0, 0]  # per-bank write index
        self.counter = [0, 0, 0]
        self.nframes = 0

    def _updates(self, alpha):
        # C++ recomputes update periods from the current learning rate
        if alpha >= 1.0:
            return [1, 1, 1]
        la = math.log(1.0 - alpha)
        Ks = int(math.log(0.7) / la) + 1
        Km = int(math.log(0.4) / la) - Ks + 1
        Kl = int(math.log(0.1) / la) - Ks - Km + 1
        n = self.p.nN
        return [Ks // n + 1, Km // n + 1, Kl // n + 1]

    def _classify(self, x):
        d = self.samples - x[None, None, :]
        dist2 = (d * d).sum(-1)
        close = (dist2 < self.p.Tb) & self.used
        n_total = int(close.sum())
        n_flagged = int((close & self.flags).sum())
        include = n_total >= self.p.kNN
        bg = n_flagged >= self.p.kNN
        return bg, include

    def apply(self, x, lr=-1):
        p = self.p
        x = np.asarray(x, np.float32)
        self.nframes += 1
        if lr < 0:
            alpha = 1.0 / min(2 * self.nframes, p.history)
        else:
            alpha = lr
        ups = self._updates(alpha) if alpha > 0 else [1, 1, 1]

        bg, include = self._classify(x)

        # long takes the mid slot about to be overwritten? (variant A:
        # promotion copies from the next-shorter bank's current index)
        if self.counter[2] == 0:
            j = self.idx[1]
            self.samples[2, self.idx[2]] = self.samples[1, j]
            self.flags[2, self.idx[2]] = self.flags[1, j]
            self.used[2, self.idx[2]] = self.used[1, j]
            self.idx[2] = (self.idx[2] + 1) % p.nN
        if self.counter[1] == 0:
            j = self.idx[0]
            self.samples[1, self.idx[1]] = self.samples[0, j]
            self.flags[1, self.idx[1]] = self.flags[0, j]
            self.used[1, self.idx[1]] = self.used[0, j]
            self.idx[1] = (self.idx[1] + 1) % p.nN
        if self.counter[0] == 0:
            self.samples[0, self.idx[0]] = x
            self.flags[0, self.idx[0]] = include
            self.used[0, self.idx[0]] = True
            self.idx[0] = (self.idx[0] + 1) % p.nN

        for b in range(3):
            self.counter[b] += 1
            if self.counter[b] >= ups[b]:
                self.counter[b] = 0
        return 0 if bg else 255


def compare(seq, lr=-1, p=P):
    m_cv = cv2.createBackgroundSubtractorKNN(
        history=p.history, dist2Threshold=p.Tb, detectShadows=False
    )
    m_us = Model(p)
    diffs = []
    for t, v in enumerate(seq):
        img = np.array(v, np.uint8).reshape(1, 1, 3)
        r_cv = int(m_cv.apply(img, None, lr)[0, 0])
        r_us = m_us.apply(np.asarray(v, np.float32), lr)
        if r_cv != r_us:
            diffs.append((t, tuple(np.atleast_1d(v).tolist()), r_cv, r_us))
    return diffs


if __name__ == "__main__":
    rng = np.random.default_rng(0)
    total = 0
    shown = 0
    for trial in range(24):
        T = 120
        kind = trial % 4
        if kind == 0:
            a, b = rng.integers(0, 256, (2, 3))
            seq = [a if rng.random() < 0.7 else b for _ in range(T)]
        elif kind == 1:
            base = rng.integers(30, 220, 3)
            seq = [np.clip(base + rng.normal(0, 10, 3), 0, 255).astype(int)
                   for _ in range(T)]
        elif kind == 2:
            levels = rng.integers(0, 256, (5, 3))
            seq = [levels[rng.integers(0, 5)] for _ in range(T)]
        else:
            seq = [np.full(3, 60)] * 50 + [np.full(3, 200)] * 70
        d = compare(seq)
        total += len(d)
        if d and shown < 4:
            shown += 1
            print(f"trial {trial} kind {kind}: {len(d)} diffs, first {d[:5]}")
    print(f"total train-mask diffs: {total}/{24*120}")
