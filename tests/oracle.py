"""NumPy oracle: direct behavioral transcription of the reference's candidate
evaluation (src/gpd/candidate/{hand_set,finger_hand,antipodal,local_frame}.cpp)
used as ground truth for the vectorized TPU kernels. Deliberately slow and
literal — mirrors the C++ control flow (early exits, break-based scans)."""

import math

import numpy as np


def finger_spacing(od, fw, P):
    fs_half = np.linspace(0.0, od - fw, P)
    return np.concatenate([fs_half - od + fw, fs_half])


class OracleFingerHand:
    """finger_hand.cpp transcription."""

    def __init__(self, fw, od, depth, P):
        self.fw, self.od, self.depth, self.P = fw, od, depth, P
        self.spacing = finger_spacing(od, fw, P)
        self.fingers = np.zeros(2 * P, bool)
        self.hand = np.zeros(P, bool)
        self.top = self.bottom = self.center = 0.0
        self.left = self.right = 0.0

    def is_gap_free(self, pts, cropped, j):
        x = pts[cropped, 1]
        lo, hi = self.spacing[j], self.spacing[j] + self.fw
        return not np.any((x > lo) & (x < hi))

    def evaluate_fingers(self, pts, bite, idx=-1):
        self.top = bite
        self.bottom = bite - self.depth
        self.center = 0.0
        self.fingers[:] = False
        fwd = pts[:, 0]
        if np.any(fwd[fwd < bite] < self.bottom):
            return
        cropped = np.nonzero(fwd < bite)[0]
        if len(cropped) == 0:
            return
        if idx == -1:
            for j in range(2 * self.P):
                if self.is_gap_free(pts, cropped, j):
                    self.fingers[j] = True
        else:
            if self.is_gap_free(pts, cropped, idx):
                self.fingers[idx] = True
            if self.is_gap_free(pts, cropped, self.P + idx):
                self.fingers[self.P + idx] = True

    def evaluate_hand(self):
        self.hand = self.fingers[:self.P] & self.fingers[self.P:]

    def evaluate_hand_idx(self, idx):
        self.hand[:] = False
        self.hand[idx] = self.fingers[idx] & self.fingers[self.P + idx]

    def choose_middle(self):
        ids = np.nonzero(self.hand)[0]
        if len(ids) == 0:
            return -1
        return int(ids[math.ceil(len(ids) / 2.0) - 1])

    def deepen(self, pts, min_depth, max_depth):
        idx = self.choose_middle()
        opp = self.P + idx
        step = 0.005
        saved = (self.top, self.bottom, self.fingers.copy())
        last = saved
        depth = min_depth + step
        while depth <= max_depth:
            f = OracleFingerHand(self.fw, self.od, self.depth, self.P)
            f.fingers = self.fingers.copy()
            f.evaluate_fingers(pts, depth, idx)
            if not (f.fingers[idx] and f.fingers[opp]):
                break
            last = (f.top, f.bottom, f.fingers.copy())
            depth += step
        self.top, self.bottom, self.fingers = last
        self.hand[:] = False
        self.hand[idx] = True
        return idx

    def closing_region(self, pts, idx):
        if idx == -1:
            idx = int(np.nonzero(self.hand)[0][0])
        self.left = self.spacing[idx] + self.fw
        self.right = self.spacing[self.P + idx]
        self.center = 0.5 * (self.left + self.right)
        m = (pts[:, 0] > self.bottom) & (pts[:, 0] < self.top) & \
            (pts[:, 1] > self.left) & (pts[:, 1] < self.right)
        return np.nonzero(m)[0]


def oracle_antipodal(pts, normals, friction_deg=20.0, min_viable=6,
                     extremal=0.003):
    """antipodal.cpp:10-96. pts/normals: (n, 3) in hand frame.
    Returns 0/1/2 = NO/HALF/FULL."""
    lat, fwd, vert = 1, 0, 2
    cosf = math.cos(friction_deg * math.pi / 180.0)
    y = pts[:, lat]
    min_x = y.min() + extremal
    max_x = y.max() - extremal
    left = (-normals[:, lat] > cosf) & (y < min_x)
    right = (normals[:, lat] > cosf) & (y > max_x)
    result = 0
    if left.any() or right.any():
        result = 1
    if left.any() and right.any():
        lp, rp = pts[left], pts[right]
        top_y = min(lp[:, fwd].max(), rp[:, fwd].max())
        bot_y = max(lp[:, fwd].min(), rp[:, fwd].min())
        top_z = min(lp[:, vert].max(), rp[:, vert].max())
        bot_z = max(lp[:, vert].min(), rp[:, vert].min())

        def count(p):
            return int(np.sum((p[:, fwd] >= bot_y) & (p[:, fwd] <= top_y) &
                              (p[:, vert] >= bot_z) & (p[:, vert] <= top_z)))
        if count(lp) >= min_viable and count(rp) >= min_viable:
            result = 2
    return result


def oracle_local_frame(neighbor_normals):
    """local_frame.cpp:14-40. neighbor_normals: (n, 3)."""
    N = neighbor_normals.T
    M = N @ N.T
    w, V = np.linalg.eigh(M)
    curvature = V[:, 0]
    normal = V[:, 2]
    avg = N.sum(axis=1)
    avg = avg / np.linalg.norm(avg)
    if avg @ normal < 0:
        normal = -normal
    binormal = np.cross(curvature, normal)
    return np.stack([normal, binormal, curvature], axis=1)


def rot_axis(axis, ang):
    c, s = math.cos(ang), math.sin(ang)
    if axis == 0:
        return np.array([[1, 0, 0], [0, c, -s], [0, s, c]])
    if axis == 1:
        return np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])
    return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])


ROT_BINORMAL = np.diag([-1.0, 1.0, -1.0])


def oracle_filter_workspace(pos, R, width, workspace, min_aperture,
                            max_aperture, od, depth):
    """filterGraspsWorkspace transcription (grasp_detector.cpp:334-398),
    including the right_top = left_bottom + depth*approach quirk
    (:362-363). Returns True if the grasp survives."""
    if not (min_aperture <= width <= max_aperture):
        return False
    approach, binormal = R[:, 0], R[:, 1]
    half_w = 0.5 * od
    left_bottom = pos + half_w * binormal
    right_bottom = pos - half_w * binormal
    left_top = left_bottom + depth * approach
    right_top = left_bottom + depth * approach
    appr = pos - 0.05 * approach
    pts = np.stack([left_bottom, right_bottom, left_top, right_top, appr])
    w = workspace
    lo = np.array([w[0], w[2], w[4]])
    hi = np.array([w[1], w[3], w[5]])
    return bool((pts.min(0) >= lo).all() and (pts.max(0) <= hi).all())


def oracle_pipeline_candidates(points, normals, samples, frames, fvalid, cfg):
    """Full candidate-pipeline oracle for a fixed sample set: per-sample
    hand-search neighborhood -> evalHandSet -> workspace/aperture filters
    (grasp_detector.cpp:192-258 steps 1-2, with frames supplied so the
    orientation grids coincide). Returns a flat list of records ordered
    (sample-major, then axis x orientation) exactly like the kernel's
    Grasps layout."""
    out = []
    M = cfg.num_orientations * len(cfg.hand_axes)
    hg = cfg.hand_geometry
    for s in range(len(samples)):
        if not fvalid[s]:
            out.extend([dict(valid=False)] * M)
            continue
        d = np.linalg.norm(points - samples[s], axis=1)
        nb = d <= cfg.hand_search_radius
        recs = oracle_eval_hand_set(
            points[nb], normals[nb], samples[s], frames[s],
            cfg.angles, cfg.hand_axes, hg,
            P=cfg.num_finger_placements, deepen=cfg.deepen_hand)
        for r in recs:
            if r["valid"]:
                r["valid"] = oracle_filter_workspace(
                    r["pos"], r["R"], r["width"], cfg.workspace_grasps,
                    cfg.min_aperture, cfg.max_aperture,
                    hg.outer_diameter, hg.depth)
        out.extend(recs)
    return out


def oracle_eval_hand_set(points, normals, sample, frame, angles, hand_axes,
                         hg, P=10, deepen=True, friction=20.0, min_viable=6):
    """hand_set.cpp:31-116 evalHandSet/evalHands for one sample.

    points/normals: (n,3) full neighborhood (already radius-limited);
    frame: (3,3) columns [normal, binormal, curvature].
    Returns list of dicts per (axis, orientation), with is_valid flag.
    """
    results = []
    for ax in hand_axes:
        for ang in angles:
            rot = rot_axis(ax, ang)
            frame_rot = frame @ ROT_BINORMAL @ rot
            p = (points - sample) @ frame_rot           # R^T (x - s) row form
            n = normals @ frame_rot
            hmask = (p[:, 2] > -hg.height) & (p[:, 2] < hg.height)
            pc, nc = p[hmask], n[hmask]

            fh = OracleFingerHand(hg.finger_width, hg.outer_diameter,
                                  hg.depth, P)
            fh.evaluate_fingers(pc, hg.init_bite)
            fh.evaluate_hand()
            rec = dict(valid=False, R=frame_rot)
            if fh.hand.any():
                if deepen:
                    idx = fh.deepen(pc, hg.init_bite, hg.depth)
                else:
                    idx = fh.choose_middle()
                closing = fh.closing_region(pc, idx)
                if len(closing) > 0:
                    rec["valid"] = True
                    rec["top"] = fh.top
                    rec["bottom"] = fh.bottom
                    rec["center"] = fh.center
                    rec["idx"] = idx
                    rec["width"] = pc[closing, 1].max() - pc[closing, 1].min()
                    rec["pos"] = frame_rot @ np.array(
                        [fh.bottom, fh.center, 0.0]) + sample
                    label = oracle_antipodal(pc[closing], nc[closing],
                                             friction, min_viable)
                    rec["full"] = label == 2
                    rec["half"] = label >= 1
            results.append(rec)
    return results


def oracle_refine_normals(points, normals, k=10, max_iterations=15,
                          convergence_rms=1e-4):
    """pcl::NormalRefinement transcription (called by cloud.cpp:176-204 with
    k-NN indices from nearestKSearch, default filter parameters): per
    iteration each normal becomes the normalized uniform-weight average of
    its k nearest neighbors' previous-iteration normals (self included, no
    sign alignment); stop after max_iterations or when the RMS normal
    change drops below convergence_rms."""
    n = len(points)
    d2 = np.sum((points[:, None, :] - points[None, :, :]) ** 2, axis=-1)
    idx = np.argsort(d2, axis=1, kind="stable")[:, :k]
    cur = normals.astype(np.float64).copy()
    for _ in range(max_iterations):
        new = cur.copy()
        for i in range(n):
            avg = cur[idx[i]].sum(axis=0)
            nrm = np.linalg.norm(avg)
            if nrm > 0:
                new[i] = avg / nrm
        rms = np.sqrt(np.sum((new - cur) ** 2) / n)
        cur = new
        if rms < convergence_rms:
            break
    return cur
