"""CCL + mask-cleanup parity vs OpenCV's contour machinery."""

import cv2
import numpy as np

from vbr_tpu.ops import ccl

RNG = np.random.default_rng(2)


def reference_clean(mask, figure_threshold, inner_threshold):
    """The reference's exact hierarchy walk
    (background_subtraction.py:171-193) using OpenCV."""
    contours, hierarchy = cv2.findContours(mask, cv2.RETR_TREE, cv2.CHAIN_APPROX_SIMPLE)
    fg = np.zeros_like(mask)
    for idx, contour in enumerate(contours):
        if cv2.contourArea(contour) >= figure_threshold:
            cv2.drawContours(fg, [contour], -1, 255)
            cv2.fillPoly(fg, [contour], 255)
            inner_idx = hierarchy[0][idx][2]
            while inner_idx != -1:
                if cv2.contourArea(contours[inner_idx], True) >= inner_threshold:
                    cv2.fillPoly(fg, [contours[inner_idx]], 0)
                    cv2.drawContours(fg, [contours[inner_idx]], -1, 255)
                inner_idx = hierarchy[0][inner_idx][0]
    fg[fg > 0] = 255
    return fg


class TestLabeling:
    def test_matches_opencv_components(self):
        mask = (RNG.uniform(size=(60, 80)) < 0.45).astype(np.uint8) * 255
        labels = np.asarray(ccl.label_components(mask > 0))
        n_cv, labels_cv = cv2.connectedComponents(mask, connectivity=8)
        # same partition: bijection between label sets
        ours_fg = labels[mask > 0]
        cv_fg = labels_cv[mask > 0]
        pairs = set(zip(ours_fg.tolist(), cv_fg.tolist()))
        assert len(pairs) == len(set(p[0] for p in pairs)) == len(
            set(p[1] for p in pairs)
        )
        assert len(set(ours_fg.tolist())) == n_cv - 1

    def test_spiral_converges(self):
        # worst-case snake: long winding 1px path
        m = np.zeros((40, 40), np.uint8)
        for r in range(0, 40, 4):
            m[r, : 39 if (r // 4) % 2 == 0 else 40] = 255
            if r + 4 < 40:
                col = 39 if (r // 4) % 2 == 0 else 0
                m[r : r + 5, col] = 255
        labels = np.asarray(ccl.label_components(m > 0, max_iters=64))
        vals = np.unique(labels[m > 0])
        assert len(vals) == 1, f"snake should be one component, got {len(vals)}"

    def test_areas(self):
        mask = np.zeros((30, 30), bool)
        mask[2:10, 2:10] = True  # 64
        mask[15:20, 15:28] = True  # 65
        labels = ccl.label_components(mask)
        areas = np.asarray(ccl.component_areas(labels))
        got = sorted(a for a in np.unique(areas[areas > 0]))
        assert got == [64, 65]


class TestCleanMask:
    def test_donut_semantics(self):
        m = np.zeros((100, 120), np.uint8)
        m[10:90, 10:110] = 255
        m[30:50, 30:50] = 0  # big hole: signed area 439 >= 115 → carved
        m[60:65, 70:75] = 0  # small hole: 34 < 115 → filled
        ours = np.asarray(ccl.clean_mask(m, 5000, 115))
        ref = reference_clean(m, 5000, 115)
        agree = (ours == ref).mean()
        assert agree > 0.995, f"agreement {agree}"
        # semantic spot-checks
        assert ours[35:45, 35:45].max() == 0  # big hole stays black
        assert ours[61:64, 71:74].min() == 255  # small hole filled

    def test_small_components_removed(self):
        m = np.zeros((80, 80), np.uint8)
        m[5:10, 5:10] = 255  # 25 px — below figure threshold
        m[20:70, 20:70] = 255  # 2500 px — above threshold 2000
        ours = np.asarray(ccl.clean_mask(m, 2000, 115))
        assert ours[6, 6] == 0
        assert ours[40, 40] == 255

    def test_random_blobs_vs_reference(self):
        # random blobby mask via thresholded blurred noise
        noise = RNG.uniform(size=(120, 160)).astype(np.float32)
        blur = cv2.GaussianBlur(noise, (31, 31), 8)
        m = (blur > np.quantile(blur, 0.72)).astype(np.uint8) * 255
        ours = np.asarray(ccl.clean_mask(m, 300, 50))
        ref = reference_clean(m, 300, 50)
        agree = (ours == ref).mean()
        assert agree > 0.98, f"agreement {agree}"


class TestHostBackend:
    def test_host_matches_device(self):
        noise = RNG.uniform(size=(100, 140)).astype(np.float32)
        blur = cv2.GaussianBlur(noise, (31, 31), 8)
        m = (blur > np.quantile(blur, 0.7)).astype(np.uint8) * 255
        a = np.asarray(ccl.clean_mask(m, 400, 60))
        b = ccl.clean_mask_host(m, 400, 60)
        np.testing.assert_array_equal(a, b)

    def test_host_matches_reference_walk(self):
        m = np.zeros((100, 120), np.uint8)
        m[10:90, 10:110] = 255
        m[30:50, 30:50] = 0
        m[60:65, 70:75] = 0
        ours = ccl.clean_mask_host(m, 5000, 115)
        ref = reference_clean(m, 5000, 115)
        assert (ours == ref).mean() > 0.995
