"""Appearance-based place recognition: bag-of-words + geometric verification.

Re-implements the reference's PlaceRecognizer
(/root/reference/scavislam/placerecognizer.{h,cpp}): per keyframe it detects
keypoints that carry disparity, describes them, quantizes each descriptor to
a visual word, scores candidate locations by TF-IDF over an inverted index
excluding the covisible neighborhood (placerecognizer.cpp:130-172, 249-298),
and confirms the best candidate (score > 2.0) with a 3-point RANSAC absolute
orientation (>30 inliers -> DetectedLoop, placerecognizer.cpp:174-202).

TPU-first differences:
- descriptors: batched 128-D gradient histograms (ops.descriptors) instead of
  nonfree SURF;
- vocabulary: plain (K, 128) float matrix; quantization is ONE
  descriptors @ vocab.T matmul + argmax (the reference walks a FLANN KMeans
  tree per descriptor, placerecognizer.cpp:130-152);
- vocabulary training: batched Lloyd's k-means on device
  (apps/create_dictionary), vs the reference's offline FLANN hierarchical
  clustering (create_dictionary.cpp:144-177);
- RANSAC: vmapped hypothesis sweep (ops.ransac) instead of 100 sequential
  iterations.

The inverted index / TF-IDF bookkeeping stays on host (tiny scalar work).
"""

from __future__ import annotations

from collections import defaultdict

import jax
import jax.numpy as jnp
import numpy as np

from scavislam_tpu.core.camera import StereoCamera
from scavislam_tpu.models.backend import DetectedLoop
from scavislam_tpu.ops.descriptors import (BOW_KEYPOINTS, bow_describe,
                                           match_descriptors)
from scavislam_tpu.ops.ransac import ransac_se3, refine_se3_from_inliers
from scavislam_tpu.pipeline.monitors import PlaceRecognizerMonitor

SCORE_THR = 2.0  # placerecognizer.cpp best-score acceptance
MIN_INLIERS = 30  # placerecognizer.cpp:197 (>30 inliers)
MAX_KEYPOINTS = BOW_KEYPOINTS


class Place:
    """Stored location (parity: Place, placerecognizer.h)."""

    def __init__(self, kf_id, words, desc, uvd, xyz, exclude,
                 padded=None):
        self.kf_id = kf_id
        self.words = words  # (N,) word ids
        self.desc = desc  # (N, 128)
        self.uvd = uvd  # (N, 3) u, v, disparity
        self.xyz = xyz  # (N, 3) camera-frame points
        self.exclude = exclude  # covisible kf ids at insertion time
        self.n_words = len(words)  # parity: Location::number_of_words
        # fixed-capacity (MAX_KEYPOINTS) padded views for the DEVICE-side
        # geometric check — variable-length arrays recompile per shape
        self.padded = padded  # (desc_p, xyz_p, valid_p) or None


def random_vocabulary(k=1024, dim=128, seed=0) -> np.ndarray:
    """Random unit vocabulary — last-resort fallback / test fixture only.
    Random projections give NO TF-IDF separation at the reference operating
    point (measured: true-revisit median 6.6 vs distractor 5.5, both >2.0);
    production paths must use the trained dictionary."""
    rng = np.random.RandomState(seed)
    v = rng.randn(k, dim).astype(np.float32)
    v /= np.linalg.norm(v, axis=1, keepdims=True) + 1e-9
    return v


def default_vocabulary() -> np.ndarray:
    """The shipped trained dictionary (scavislam_tpu/data/vocabulary.npz,
    10,000 words — the reference's vocabulary scale; trained by
    ``apps/create_dictionary --synthetic --corpus-recipe v3`` on varied
    scenes DISJOINT from every benchmark scene, chunked-scan Lloyd k-means
    on TPU). Counterpart of the reference's 10k-word SURF vocabulary
    data/surfwords10000.png (placerecognizer.cpp:87-112). Measured vs the
    earlier 4096-word artifact (benchmarks/loop_recall.py): mean recall
    0.66 -> 0.794 at precision 1.00. Falls back to a random vocabulary with a
    loud warning if the artifact is missing — recall is badly degraded
    then."""
    import os
    import warnings

    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "data", "vocabulary.npz")
    if os.path.exists(path):
        return np.load(path)["vocab"].astype(np.float32)
    warnings.warn(
        "scavislam_tpu/data/vocabulary.npz not found — falling back to a "
        "RANDOM vocabulary; loop-closure/relocalization recall will be "
        "severely degraded. Train one with apps/create_dictionary.",
        stacklevel=2)
    return random_vocabulary()


from functools import partial as _partial


def unpack_bow(packed: np.ndarray):
    """Split one bow_describe block [word | desc | u v d | x y z | valid]
    into (words int64, desc, uvd, xyz, valid bool) numpy views."""
    dcols = packed.shape[1] - 8
    return (
        packed[:, 0].astype(np.int64),
        packed[:, 1:1 + dcols],
        packed[:, 1 + dcols:4 + dcols],
        packed[:, 4 + dcols:7 + dcols],
        packed[:, 7 + dcols] > 0.5,
    )


@_partial(jax.jit, static_argnames=("cam_params", "mono"))
def _describe_device(img, disp, vocab, cam_params, mono):
    """The WHOLE describe pipeline (corners -> disparity gate -> gradients
    -> descriptors -> BoW quantization) as ONE jitted program returning one
    packed array (ops.descriptors.bow_describe). Eagerly dispatched, the
    same pipeline is ~7 device ops per keyframe indexed — at reference
    keyframe cadence (~1/5 frames) the PR thread's dispatch traffic contends
    with the frame loop on the tunnel link and was a measured drag on the
    loop-closure benchmark. Keyframe packets that carry a `pr_packed` block
    (the spawn-fused path, models.frontend_step) skip this program
    entirely."""
    return bow_describe(img, disp, vocab, cam_params, mono)


@_partial(jax.jit, static_argnames=("cam_params", "inlier_thr",
                                    "num_hypotheses"))
def _geom_check_device(key, desc_a, xyz_qa, valid_a, desc_b, xyz_cb,
                       valid_b, cam_params, inlier_thr, num_hypotheses):
    """BF match + 3-point RANSAC + inlier refit as ONE program, ONE packed
    fetch [R(9), t(3), n_matched, n_inliers]. The unfused pipeline cost 3
    dispatches + 3 fetches per geometric check over the tunnel."""
    idx_b, ok = match_descriptors(desc_a, desc_b,
                                  valid_a=valid_a, valid_b=valid_b)
    # correspondences: loop(cand) points -> query points
    xyz_a = jnp.where(ok[:, None], xyz_cb[idx_b], 0.0)
    R, t, inliers, n_in = ransac_se3(
        key, xyz_a, xyz_qa, ok, cam_params,
        inlier_thr=inlier_thr, num_hypotheses=num_hypotheses)
    T = refine_se3_from_inliers(xyz_a, xyz_qa, inliers)
    return jnp.concatenate([
        T.R.reshape(9), T.t,
        jnp.sum(ok).astype(jnp.float32)[None],
        n_in.astype(jnp.float32)[None],
    ])


class PlaceRecognizer:
    def __init__(self, cam: StereoCamera, vocabulary: np.ndarray = None,
                 monitor: PlaceRecognizerMonitor = None,
                 score_thr: float = SCORE_THR,
                 min_inliers: int = MIN_INLIERS,
                 idf_mode: str = "reference"):
        # idf_mode: "reference" ships the reference's UNLOGGED idf =
        # n_docs/postings (placerecognizer.cpp:161-171) — the shipped
        # default, threshold 2.0 carries over. "log" is a NON-DEFAULT
        # experiment flag (BM25-style idf = log1p(n_docs/postings)) that
        # compresses the common/rare word dynamic range; it exists to
        # QUANTIFY the corridor-recall cap the reference formula inherits
        # from idf dilution on self-similar scenes (benchmarks/loop_recall
        # --idf log; RESULTS.md). Thresholds do not carry over between
        # modes.
        assert idf_mode in ("reference", "log")
        self.idf_mode = idf_mode
        self.cam = cam
        self.vocab = jnp.asarray(
            vocabulary if vocabulary is not None else default_vocabulary()
        )
        self.monitor = monitor or PlaceRecognizerMonitor()
        self.score_thr = score_thr
        self.min_inliers = min_inliers
        self.location_map: dict[int, Place] = {}
        self.inverted_index: dict[int, dict[int, int]] = defaultdict(dict)
        self.word_doc_count: dict[int, int] = defaultdict(int)
        self._key = jax.random.PRNGKey(42)
        from collections import Counter

        self.counters = Counter()  # indexed / over_thr / geo checks / loops

    # ------------------------------------------------------------------ #
    def describe(self, img: jnp.ndarray, disp: jnp.ndarray):
        """Detect + describe keypoints that carry disparity
        (parity: placerecognizer.cpp:222-246).

        disp=None selects the MONOCULAR path (trace-time branch): no depth
        gating, zero xyz — retrieval-only places whose geometric check is
        delegated to the mono Sim3 machinery (models.mono_loop).

        ONE jitted program + ONE packed fetch per call (_describe_device):
        both the eager-op dispatch traffic and multi-array fetches are
        tunnel round-trips that contend with the frame loop."""
        cam_params = (float(self.cam.focal), float(self.cam.pp[0]),
                      float(self.cam.pp[1]), float(self.cam.baseline))
        mono = disp is None
        packed = np.asarray(_describe_device(
            img, (jnp.zeros_like(img) if mono else disp), self.vocab,
            cam_params, mono))
        return unpack_bow(packed)

    # ------------------------------------------------------------------ #
    def step(self) -> bool:
        """One poll of the PR thread loop (placerecognizer.cpp:114-128)."""
        data = self.monitor.getKeyframeDate()
        if data is None:
            return False
        self.add_location(data)
        return True

    def run(self, stop_event):
        import time

        self.working = False
        while not stop_event.is_set():
            self.working = True
            did = self.step()
            self.working = False
            if not did:
                time.sleep(0.001)

    def warmup(self):
        """Compile every device program of the PR path once (describe +
        match + RANSAC + refine). Without this the first geometric check
        compiles mid-run (~10-30 s over a remote link) while the input
        mailbox drops every arriving keyframe."""
        h, w = self.cam.size[1], self.cam.size[0]
        img = jnp.zeros((h, w), jnp.float32)
        disp = jnp.ones((h, w), jnp.float32) * 5.0
        words, desc, uvd, xyz, valid = self.describe(img, disp)
        # the production geometric check runs on MAX_KEYPOINTS-padded
        # arrays (Place.padded); warm that exact shape
        n = MAX_KEYPOINTS
        desc_p = np.zeros((n, desc.shape[1]), np.float32)
        xyz_p = np.zeros((n, 3), np.float32)
        va = jnp.ones(n, bool)
        self._key, sub = jax.random.split(self._key)
        cam_params = (float(self.cam.focal), float(self.cam.pp[0]),
                      float(self.cam.pp[1]), float(self.cam.baseline))
        np.asarray(_geom_check_device(
            sub, jnp.asarray(desc_p), jnp.asarray(xyz_p), va,
            jnp.asarray(desc_p), jnp.asarray(xyz_p), va,
            cam_params, 3.0, 256))

    def add_location(self, data: dict):
        """Parity: addLocation (placerecognizer.cpp:206-324).

        When the packet carries `pr_packed` — the BoW block computed INSIDE
        the fused keyframe-spawn program and fetched with the spawn payload
        (models.frontend_step) — no device work happens here at all: the PR
        thread becomes pure host bookkeeping except for the rare geometric
        check."""
        kf_id = data["kf_id"]
        if data.get("pr_packed") is not None:
            words, desc, uvd, xyz, valid = unpack_bow(
                np.asarray(data["pr_packed"]))
        else:
            words, desc, uvd, xyz, valid = self.describe(
                data["img"], data["disp"])
        padded = (np.asarray(desc, np.float32), np.asarray(xyz, np.float32),
                  np.asarray(valid, bool))
        words = words[valid]
        desc = desc[valid]
        uvd = uvd[valid]
        xyz = xyz[valid]
        exclude = set(data.get("exclude", set())) | {kf_id}

        # TF-IDF scoring against existing locations (calcLoopStatistics)
        scores = self._score(words, exclude)
        place = Place(kf_id, words, desc, uvd, xyz, exclude, padded=padded)
        self.location_map[kf_id] = place
        for w, c in zip(*np.unique(words, return_counts=True)):
            self.inverted_index[int(w)][kf_id] = int(c)
            self.word_doc_count[int(w)] += 1

        self.counters["indexed"] += 1
        self.last_best = None  # (kf_id, score) of this query's best match
        if not scores:
            return None
        best_id, best_score = max(scores.items(), key=lambda kv: kv[1])
        self.last_best = (best_id, float(best_score))
        self.counters["best_score_max"] = max(
            self.counters["best_score_max"], int(best_score * 100))
        if best_score <= self.score_thr:
            return None
        self.counters["over_threshold"] += 1
        loop = self._geometric_check(place, self.location_map[best_id])
        if loop is not None:
            self.counters["loops_emitted"] += 1
            self.monitor.addLoop(loop)
        return loop

    def _score(self, words: np.ndarray, exclude: set) -> dict:
        """TF-IDF accumulation over the inverted index, excluding the covis
        neighborhood — the REFERENCE formula (placerecognizer.cpp:131-171,
        invoked per query descriptor at 254-298):

            score[other] = sum_w  c_query(w) * tf(w, other) * idf(w)
            tf  = wordcount(w, other) / number_of_words(other)
            idf = n_locations / n_locations_containing_word   (unlogged)

        so the acceptance threshold 2.0 (placerecognizer.cpp:316) carries
        over unmodified. n_locations is the index size BEFORE the query is
        inserted, exactly like the reference's calcLoopStatistics."""
        n_docs = float(max(len(self.location_map), 1))
        scores: dict[int, float] = defaultdict(float)
        uw, counts = np.unique(words, return_counts=True)
        log_mode = self.idf_mode == "log"
        for w, c in zip(uw, counts):
            postings = self.inverted_index.get(int(w))
            if not postings:
                continue
            idf = n_docs / len(postings)
            if log_mode:
                idf = float(np.log1p(idf))
            for kf, kc in postings.items():
                if kf in exclude:
                    continue
                n_other = max(self.location_map[kf].n_words, 1)
                scores[kf] += float(c) * (float(kc) / n_other) * idf
        return dict(scores)

    def _geometric_check(self, query: Place, cand: Place):
        """BF match + vmapped 3-point RANSAC (placerecognizer.cpp:174-202).
        Returns DetectedLoop with T_query_from_loop or None.

        All device calls use FIXED-CAPACITY padded arrays (MAX_KEYPOINTS):
        the filtered variable-length descriptors recompiled the match/RANSAC
        programs per distinct count (7-30 s each over a remote link — it
        starved the indexing thread and made loop detection flaky)."""
        if len(query.words) < 3 or len(cand.words) < 3:
            return None
        if query.padded is not None and cand.padded is not None:
            desc_a, xyz_qa, valid_a = query.padded
            desc_b, xyz_cb, valid_b = cand.padded
        else:  # legacy unpadded places (tests constructing Place directly)
            desc_a, xyz_qa = query.desc, query.xyz
            valid_a = np.ones(len(desc_a), bool)
            desc_b, xyz_cb = cand.desc, cand.xyz
            valid_b = np.ones(len(desc_b), bool)
        self._key, sub = jax.random.split(self._key)
        cam_params = (float(self.cam.focal), float(self.cam.pp[0]),
                      float(self.cam.pp[1]), float(self.cam.baseline))
        packed = np.asarray(_geom_check_device(
            sub, jnp.asarray(desc_a, jnp.float32),
            jnp.asarray(xyz_qa, jnp.float32), jnp.asarray(valid_a),
            jnp.asarray(desc_b, jnp.float32),
            jnp.asarray(xyz_cb, jnp.float32), jnp.asarray(valid_b),
            cam_params, 3.0, 256))
        n_matched, n_in = int(packed[12]), int(packed[13])
        if n_matched < 3 or n_in <= self.min_inliers:
            return None
        from scavislam_tpu.core.lie import SE3 as _SE3

        T = _SE3(jnp.asarray(packed[:9].reshape(3, 3)),
                 jnp.asarray(packed[9:12]))
        return DetectedLoop(query.kf_id, cand.kf_id, T)


    def relocalize(self, img, disp, top_k: int = 3):
        """Global relocalization: find WHERE an arbitrary frame is, with no
        covisibility prior.

        CAPABILITY BEYOND THE REFERENCE: the reference has no recovery —
        tracking failure prints FAILURE! and exits (stereo_slam.cpp:706-710,
        SURVEY.md §5 'failure detection: none'). Here the same BoW index +
        geometric check that powers loop closure answers the kidnapped-robot
        query: TF-IDF scoring with an EMPTY exclude set, then the 3-point
        RANSAC check against the top-k scoring keyframes.

        Returns (loop_kf_id, (R, t) of T_query_from_loop as numpy) or None.
        """
        words, desc, uvd, xyz, valid = self.describe(img, disp)
        wv = words[valid]
        if len(wv) < 3 or not self.location_map:
            return None
        scores = self._score(wv, exclude=set())
        if not scores:
            return None
        best = sorted(scores.items(), key=lambda kv: -kv[1])[:top_k]
        place = Place(-1, wv, desc[valid], uvd[valid], xyz[valid], set(),
                      padded=(np.asarray(desc, np.float32),
                              np.asarray(xyz, np.float32),
                              np.asarray(valid, bool)))
        for kf, _sc in best:
            loop = self._geometric_check(place, self.location_map[kf])
            if loop is not None:
                T = loop.T_query_from_loop
                return loop.loop_id, (
                    np.asarray(T.R, np.float32), np.asarray(T.t, np.float32)
                )
        return None

# -- vocabulary training (device k-means) ----------------------------------- #

def train_vocabulary(descriptors: np.ndarray, k: int = 1024,
                     iters: int = 20, seed: int = 0,
                     chunk: int = 16384) -> np.ndarray:
    """Batched Lloyd's k-means on device (the reference uses FLANN
    hierarchical k-means offline, create_dictionary.cpp:144-177).

    The assignment pass runs as a lax.scan over `chunk`-row blocks: the
    similarity block (chunk, k) is one MXU matmul and the center update is
    a sorted-free scatter-add — at reference vocabulary scale (10k words,
    placerecognizer.cpp:87-112) the old one-hot-einsum formulation would
    materialize an (N, k) one-hot ~4 GB at N=100k descriptors."""
    d_np = np.asarray(descriptors, np.float32)
    n, dim = d_np.shape
    n_pad = -(-n // chunk) * chunk
    w_np = np.zeros(n_pad, np.float32)
    w_np[:n] = 1.0
    pad = np.zeros((n_pad, dim), np.float32)
    pad[:n] = d_np
    d = jnp.asarray(pad).reshape(n_pad // chunk, chunk, dim)
    w = jnp.asarray(w_np).reshape(n_pad // chunk, chunk)
    key = jax.random.PRNGKey(seed)
    init_idx = jax.random.choice(key, n, (k,), replace=n < k)
    centers = jnp.asarray(d_np[np.asarray(init_idx)])

    @jax.jit
    def step(centers):
        def proc(carry, blk):
            sums, counts = carry
            dc, wc = blk
            sim = jnp.einsum("nd,kd->nk", dc, centers,
                             preferred_element_type=jnp.float32)
            assign = jnp.argmax(sim, axis=1)
            sums = sums.at[assign].add(dc * wc[:, None])
            counts = counts.at[assign].add(wc)
            return (sums, counts), None

        (sums, counts), _ = jax.lax.scan(
            proc,
            (jnp.zeros((k, dim), jnp.float32), jnp.zeros(k, jnp.float32)),
            (d, w))
        counts = counts[:, None]
        new = jnp.where(counts > 0, sums / jnp.maximum(counts, 1.0), centers)
        norm = jnp.linalg.norm(new, axis=1, keepdims=True)
        return new / jnp.maximum(norm, 1e-9)

    for _ in range(iters):
        centers = step(centers)
    return np.asarray(centers)
