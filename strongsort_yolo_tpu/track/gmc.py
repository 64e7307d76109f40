"""Global (camera) motion compensation — host-side stage.

BoT-SORT's GMC (SURVEY.md D10/H5; ultralytics trackers/utils/gmc.py,
reached via ``tracker="botsort.yaml"`` at
/root/reference/yolo_multi_model.py:41) estimates a frame-to-frame
affine warp and applies it to track means before association.

Sparse optical flow is inherently host work (OpenCV); the design keeps
it OFF the accelerator: the host computes the (2, 3) warp while the
device runs the detector, and the warp is fed into the jitted tracking
step as a tiny array input (track/bytetrack.py ``apply_warp``) — the
hard part #5 in SURVEY.md §7.
"""

from __future__ import annotations

import numpy as np

IDENTITY_WARP = np.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]], np.float32)


class SparseOptFlowGMC:
    """Frame-to-frame affine estimation via sparse LK optical flow.

    method: "sparseOptFlow" (goodFeaturesToTrack + pyramidal LK +
    RANSAC partial-affine), "ecc" (ECC on downscaled gray — StrongSORT
    H5 flavor), or "none".
    """

    def __init__(self, method: str = "sparseOptFlow", downscale: int = 2):
        self.method = method
        self.downscale = max(1, int(downscale))
        self._prev_gray: np.ndarray | None = None
        self._prev_pts: np.ndarray | None = None

    def reset(self) -> None:
        self._prev_gray = None
        self._prev_pts = None

    def apply(self, frame_bgr: np.ndarray) -> np.ndarray:
        """-> (2, 3) affine warp mapping previous-frame coords to
        current-frame coords (identity on the first frame/failure)."""
        if self.method == "none":
            return IDENTITY_WARP
        import cv2

        gray = cv2.cvtColor(frame_bgr, cv2.COLOR_BGR2GRAY)
        if self.downscale > 1:
            gray = cv2.resize(
                gray,
                (gray.shape[1] // self.downscale, gray.shape[0] // self.downscale),
            )
        warp = IDENTITY_WARP.copy()
        if self._prev_gray is not None:
            if self.method == "ecc":
                warp = self._ecc(self._prev_gray, gray)
            else:
                warp = self._sparse_flow(self._prev_gray, gray)
        self._prev_gray = gray
        return warp

    def _sparse_flow(self, prev: np.ndarray, cur: np.ndarray) -> np.ndarray:
        import cv2

        # feature params = ultralytics trackers/utils/gmc.py
        # sparseOptFlow settings verbatim (maxCorners 1000, quality
        # 0.01, minDistance 1, blockSize 3, no Harris; downscale=2 set
        # in __init__); the >4-point floor matches their rigid-matrix
        # guard
        pts = cv2.goodFeaturesToTrack(
            prev, maxCorners=1000, qualityLevel=0.01, minDistance=1,
            blockSize=3, useHarrisDetector=False, k=0.04,
        )
        if pts is None or len(pts) <= 4:
            return IDENTITY_WARP
        nxt, status, _ = cv2.calcOpticalFlowPyrLK(prev, cur, pts, None)
        ok = status.reshape(-1).astype(bool)
        if ok.sum() <= 4:
            return IDENTITY_WARP
        a, _ = cv2.estimateAffinePartial2D(
            pts[ok], nxt[ok], method=cv2.RANSAC
        )
        if a is None:
            return IDENTITY_WARP
        return self._upscale(a)

    def _ecc(self, prev: np.ndarray, cur: np.ndarray) -> np.ndarray:
        import cv2

        warp = np.eye(2, 3, dtype=np.float32)
        criteria = (
            cv2.TERM_CRITERIA_EPS | cv2.TERM_CRITERIA_COUNT, 100, 1e-5,
        )
        try:
            _, warp = cv2.findTransformECC(
                prev, cur, warp, cv2.MOTION_EUCLIDEAN, criteria, None, 1
            )
        except cv2.error:
            return IDENTITY_WARP
        return self._upscale(warp)

    def _upscale(self, a: np.ndarray) -> np.ndarray:
        w = a.astype(np.float32).copy()
        if self.downscale > 1:
            w[:, 2] *= self.downscale
        return w


def make_gmc(method: str):
    """GMC factory: "sparseOptFlow"/"ecc" (host cv2, ultralytics
    parity), "flow_tpu" (device dense pyramidal LK — track/gmc_tpu.py),
    or "none"."""
    if method == "flow_tpu":
        from strongsort_yolo_tpu.track.gmc_tpu import FlowTpuGMC

        return FlowTpuGMC()
    return SparseOptFlowGMC(method=method if method else "none")
