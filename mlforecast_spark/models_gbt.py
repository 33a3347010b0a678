"""Histogram gradient-boosted trees (squared loss), numpy core with a
distributed-histogram Spark training path.

The reference trains LightGBM/XGBoost (locally, or distributed via SynapseML
with a local-booster extraction,
`/root/reference/mlforecast/distributed/models/spark/lgb.py:25-34`). Neither
library exists in this container, so this is a from-scratch implementation of
the same algorithm family:

- features are quantile-binned to uint8;
- trees grow level-wise; each level needs one pass computing per-
  (node, feature, bin) gradient histograms;
- split gain is the usual variance-reduction with an L2 leaf penalty.

Training paths share the split-finder:

- **local** (rows ≤ ``collect_threshold``): matrix collected once, pure numpy
  — the same "train small, broadcast the booster" shape the reference uses;
- **distributed**: the binned frame stays on executors; each Arrow batch
  emits partial histograms per level (`mapInPandas`), the driver merges the
  tiny (nodes × features × bins) tensors and picks splits — exactly
  XGBoost's approx/hist strategy, so cost per level is one narrow pass, no
  shuffle of the data itself.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

from .utils import qcol


class _TreeNode:
    __slots__ = ("feature", "bin_threshold", "left", "right", "value")

    def __init__(self):
        self.feature = -1
        self.bin_threshold = -1
        self.left = None
        self.right = None
        self.value = 0.0


class GradientBoostedTrees:
    def __init__(
        self,
        n_estimators: int = 50,
        learning_rate: float = 0.1,
        max_depth: int = 5,
        max_bins: int = 64,
        min_child_samples: int = 20,
        reg_lambda: float = 1.0,
        collect_threshold: int = 2_000_000,
        random_state: int = 0,
    ):
        self.n_estimators = n_estimators
        self.learning_rate = learning_rate
        self.max_depth = max_depth
        self.max_bins = max_bins
        self.min_child_samples = min_child_samples
        self.reg_lambda = reg_lambda
        self.collect_threshold = collect_threshold
        self.random_state = random_state
        self.trees_: list = []
        self.base_score_: float = 0.0
        self.bin_edges_: Optional[list] = None

    # ------------------------------------------------------------- binning
    def _fit_bins(self, X: np.ndarray):
        self.bin_edges_ = []
        for j in range(X.shape[1]):
            col = X[:, j]
            col = col[~np.isnan(col)]
            if len(col) == 0:
                self.bin_edges_.append(np.array([0.0]))
                continue
            qs = np.linspace(0, 1, self.max_bins + 1)[1:-1]
            edges = np.unique(np.quantile(col, qs))
            self.bin_edges_.append(edges)

    def _bin(self, X: np.ndarray) -> np.ndarray:
        out = np.empty(X.shape, dtype=np.uint8)
        for j, edges in enumerate(self.bin_edges_):
            out[:, j] = np.searchsorted(edges, np.nan_to_num(X[:, j]), side="right")
        return out

    # -------------------------------------------------------- split finder
    def _best_splits(
        self, hist_g, hist_n, node_g, node_n,
        allowed_features=None, min_samples_split=2,
    ):
        """hist_g/hist_n: (n_nodes, n_features, n_bins). Returns per node the
        (feature, bin, gain) of the best variance-reduction split.
        ``allowed_features``/``min_samples_split`` are RandomForest's
        per-tree hooks, passed as PARAMETERS so the shared split finder
        stays stateless (independent trees can train concurrently)."""
        lam = self.reg_lambda
        n_nodes, n_features, n_bins = hist_g.shape
        allowed = allowed_features
        min_split = min_samples_split
        best = []
        for node in range(n_nodes):
            G, N = node_g[node], node_n[node]
            if N < max(2 * self.min_child_samples, min_split):
                best.append(None)
                continue
            parent = (G * G) / (N + lam)
            gl = np.cumsum(hist_g[node], axis=1)
            nl = np.cumsum(hist_n[node], axis=1)
            gr = G - gl
            nr = N - nl
            with np.errstate(divide="ignore", invalid="ignore"):
                gain = (gl * gl) / (nl + lam) + (gr * gr) / (nr + lam) - parent
            valid = (nl >= self.min_child_samples) & (nr >= self.min_child_samples)
            gain = np.where(valid, gain, -np.inf)
            if allowed is not None:
                mask = np.full(n_features, True)
                mask[allowed] = False
                gain[mask, :] = -np.inf
            j, b = np.unravel_index(np.argmax(gain), gain.shape)
            best.append((int(j), int(b), float(gain[j, b])) if gain[j, b] > 1e-12 else None)
        return best

    # ------------------------------------------------------- local training
    def fit(self, X, y):
        X = np.asarray(X, dtype=np.float64)
        y = np.asarray(y, dtype=np.float64)
        self._fit_bins(X)
        Xb = self._bin(X)
        self.base_score_ = float(y.mean()) if len(y) else 0.0
        pred = np.full(len(y), self.base_score_)
        self.trees_ = []
        for _ in range(self.n_estimators):
            resid = y - pred
            tree = self._grow_tree_local(Xb, resid)
            self.trees_.append(tree)
            pred += self.learning_rate * self._apply_tree(tree, Xb)
        return self

    def _grow_tree_local(
        self, Xb: np.ndarray, resid: np.ndarray,
        allowed_features=None, min_samples_split=2,
    ):
        n, n_features = Xb.shape
        node_idx = np.zeros(n, dtype=np.int32)
        root = _TreeNode()
        nodes = [root]
        for _depth in range(self.max_depth):
            act = [i for i, nd in enumerate(nodes) if nd.feature == -1 and nd.left is None]
            if not act:
                break
            remap = {node: k for k, node in enumerate(act)}
            mask = np.isin(node_idx, act)
            compact = np.array([remap.get(v, -1) for v in range(len(nodes))])[node_idx]
            hist_g = np.zeros((len(act), n_features, self.max_bins))
            hist_n = np.zeros((len(act), n_features, self.max_bins))
            sel = compact >= 0
            cc = compact[sel]
            rr = resid[sel]
            for j in range(n_features):
                key = cc * self.max_bins + Xb[sel, j]
                minlength = len(act) * self.max_bins
                hist_g[:, j, :] = np.bincount(key, weights=rr, minlength=minlength).reshape(
                    len(act), self.max_bins
                )
                hist_n[:, j, :] = np.bincount(key, minlength=minlength).reshape(
                    len(act), self.max_bins
                )
            node_g = hist_g[:, 0, :].sum(axis=1)
            node_n = hist_n[:, 0, :].sum(axis=1)
            splits = self._best_splits(
                hist_g, hist_n, node_g, node_n,
                allowed_features=allowed_features,
                min_samples_split=min_samples_split,
            )
            new_assign = node_idx.copy()
            any_split = False
            for k, node_id in enumerate(act):
                nd = nodes[node_id]
                sp = splits[k]
                if sp is None:
                    nd.value = float(node_g[k] / (node_n[k] + self.reg_lambda))
                    continue
                j, b, _gain = sp
                nd.feature, nd.bin_threshold = j, b
                nd.left, nd.right = _TreeNode(), _TreeNode()
                nodes.extend([nd.left, nd.right])
                li, ri = len(nodes) - 2, len(nodes) - 1
                in_node = node_idx == node_id
                goes_left = in_node & (Xb[:, j] <= b)
                new_assign[goes_left] = li
                new_assign[in_node & ~goes_left] = ri
                any_split = True
            node_idx = new_assign
            if not any_split:
                break
        # value for any remaining unsplit leaves
        self._finalize_leaves(nodes, node_idx, resid)
        return root

    def _finalize_leaves(self, nodes, node_idx, resid):
        lam = self.reg_lambda
        sums = np.bincount(node_idx, weights=resid, minlength=len(nodes))
        cnts = np.bincount(node_idx, minlength=len(nodes))
        for i, nd in enumerate(nodes):
            if nd.left is None and nd.feature == -1 and cnts[i] > 0:
                nd.value = float(sums[i] / (cnts[i] + lam))

    def _apply_tree(self, root, Xb: np.ndarray) -> np.ndarray:
        out = np.empty(len(Xb))
        # iterative: vectorized walk
        stack = [(root, np.arange(len(Xb)))]
        while stack:
            nd, idx = stack.pop()
            if nd.left is None:
                out[idx] = nd.value
                continue
            go_left = Xb[idx, nd.feature] <= nd.bin_threshold
            stack.append((nd.left, idx[go_left]))
            stack.append((nd.right, idx[~go_left]))
        return out

    def predict(self, X) -> np.ndarray:
        X = np.asarray(X, dtype=np.float64)
        Xb = self._bin(X)
        out = np.full(len(Xb), self.base_score_)
        for tree in self.trees_:
            out += self.learning_rate * self._apply_tree(tree, Xb)
        return out

    # -------------------------------------------------- distributed training
    def fit_spark(self, df, feature_cols: Sequence[str], target_col: str):
        import pandas as pd

        feature_cols = list(feature_cols)
        sel = [qcol(c).cast("double").alias(f"_f{i}") for i, c in enumerate(feature_cols)]
        sel.append(qcol(target_col).cast("double").alias("_t"))
        data = df.select(*sel).na.drop()
        n_rows = data.count()
        if n_rows <= self.collect_threshold:
            pdf = data.toPandas()
            X = pdf[[f"_f{i}" for i in range(len(feature_cols))]].to_numpy()
            y = pdf["_t"].to_numpy()
            return self.fit(X, y)
        return self._fit_spark_hist(data, len(feature_cols), n_rows)

    def _fit_spark_hist(self, data, n_features: int, n_rows: int):
        """Level-wise distributed histograms: one mapInPandas pass per level;
        only (nodes × features × bins) partials travel to the driver.

        Rows are binned ONCE up front, and the running ensemble prediction is
        carried as a ``_p`` column updated (and checkpointed) once per tree —
        so per-tree cost is flat in the tree index. Replaying all prior trees
        inside every histogram pass (the naive formulation) would be
        O(T²·depth) full-data work by tree T."""
        binned = self.prepare_spark_state(data, n_features, n_rows)
        self._boost_spark(binned, n_features, self.n_estimators, update_last=False)
        return self

    def _fit_bins_from_sample(self, data, n_features: int, n_rows: int):
        """Quantile bin edges from an executor-side sample of the (cached)
        training frame — the shared first step of every distributed path."""
        frac = min(1.0, 500_000 / max(n_rows, 1))
        sample = data.sample(fraction=frac, seed=self.random_state).toPandas()
        Xs = sample[[f"_f{i}" for i in range(n_features)]].to_numpy()
        self._fit_bins(Xs)

    def _binned_frame(self, data, n_features: int, extra: dict):
        """Bin the frame once on executors (mapInPandas + eager checkpoint).
        ``extra`` maps an output column name to either a constant float
        (boosting's carried prediction ``_p``) or the name of an input
        column to carry through as int64 (the forest's row id ``_r``) —
        the ONE difference between the boosting and bagging preps."""
        import pandas as pd

        edges = self.bin_edges_

        def bin_rows(batches):
            for pdf in batches:
                X = pdf[[f"_f{i}" for i in range(n_features)]].to_numpy(
                    dtype="float64"
                )
                out = {}
                for j, e in enumerate(edges):
                    out[f"_b{j}"] = np.searchsorted(
                        e, np.nan_to_num(X[:, j]), side="right"
                    )
                out["_t"] = pdf["_t"].to_numpy(dtype="float64")
                for name, spec in extra.items():
                    if isinstance(spec, str):
                        out[name] = pdf[spec].to_numpy(dtype="int64")
                    else:
                        out[name] = np.full(len(pdf), float(spec))
                yield pd.DataFrame(out)

        schema = ", ".join(f"_b{j} long" for j in range(n_features)) + ", _t double"
        for name, spec in extra.items():
            schema += f", {name} " + ("long" if isinstance(spec, str) else "double")
        return data.mapInPandas(bin_rows, schema=schema).localCheckpoint(eager=True)

    def prepare_spark_state(self, data, n_features: int, n_rows: int):
        """Bin rows + initialize the carried prediction column WITHOUT growing
        trees — the shared prep for ``fit_spark`` and staged boosting
        (LightGBMCV). Returns the checkpointed binned frame for
        ``boost_spark``."""
        data = data.cache()
        self._fit_bins_from_sample(data, n_features, n_rows)
        self.base_score_ = float(data.agg({"_t": "avg"}).collect()[0][0] or 0.0)
        binned = self._binned_frame(data, n_features, {"_p": self.base_score_})
        data.unpersist()
        self.trees_ = []
        return binned

    def boost_spark(self, binned, n_features: int, n_trees: int):
        """Grow ``n_trees`` more trees distributed, advancing the carried
        prediction after every tree (staged-boosting continuation point).
        Returns the new binned frame to use for the next stage."""
        return self._boost_spark(binned, n_features, n_trees, update_last=True)

    def _boost_spark(self, binned, n_features: int, n_trees: int, update_last: bool):
        lr = self.learning_rate
        for i in range(n_trees):
            tree = self._grow_tree_spark(binned, n_features)
            self.trees_.append(tree)
            if not update_last and i == n_trees - 1:
                break  # fit(): no consumer for a final prediction update

            def upd(batches, tree=tree, lr=lr, nf=n_features):
                for pdf in batches:
                    Xb = np.column_stack(
                        [pdf[f"_b{j}"].to_numpy(dtype="int64") for j in range(nf)]
                    )
                    pdf = pdf.copy()
                    pdf["_p"] = pdf["_p"].to_numpy(dtype="float64") + lr * _apply_serialized(tree, Xb)
                    yield pdf

            # eager checkpoint: truncates lineage so tree k+1 reads
            # materialized rows, not a replay of the first k update passes
            binned = binned.mapInPandas(upd, schema=binned.schema).localCheckpoint(
                eager=True
            )
        return binned

    def _grow_tree_spark(self, data, n_features: int):
        import pandas as pd

        root = _TreeNode()
        nodes = [root]
        max_bins = self.max_bins
        mb = self.max_bins

        for _depth in range(self.max_depth):
            act = [i for i, nd in enumerate(nodes) if nd.feature == -1 and nd.left is None]
            if not act:
                break
            tree_struct = _serialize_nodes(nodes)
            act_set = {v: k for k, v in enumerate(act)}
            state = {"cur_tree": tree_struct, "act": act_set}

            def partials(batches, state=state, n_features=n_features, mb=mb):
                import pandas as pd

                hg = np.zeros((len(state["act"]), n_features, mb))
                hn = np.zeros((len(state["act"]), n_features, mb))
                for pdf in batches:
                    Xb = np.column_stack(
                        [
                            pdf[f"_b{j}"].to_numpy(dtype="int64")
                            for j in range(n_features)
                        ]
                    )
                    resid = pdf["_t"].to_numpy(dtype="float64") - pdf["_p"].to_numpy(
                        dtype="float64"
                    )
                    node_of = _assign_serialized(state["cur_tree"], Xb)
                    compact = np.array(
                        [state["act"].get(v, -1) for v in range(node_of.max() + 1)]
                    )[node_of]
                    selm = compact >= 0
                    cc, rrv = compact[selm], resid[selm]
                    for j in range(n_features):
                        key = cc * mb + Xb[selm, j]
                        ml = len(state["act"]) * mb
                        hg[:, j, :] += np.bincount(key, weights=rrv, minlength=ml).reshape(-1, mb)
                        hn[:, j, :] += np.bincount(key, minlength=ml).reshape(-1, mb)
                yield pd.DataFrame(
                    {"hg": [hg.ravel().tobytes()], "hn": [hn.ravel().tobytes()]}
                )

            rows = data.mapInPandas(partials, schema="hg binary, hn binary").collect()
            shape = (len(act), n_features, mb)
            hist_g = np.zeros(shape)
            hist_n = np.zeros(shape)
            for r in rows:
                hist_g += np.frombuffer(r["hg"]).reshape(shape)
                hist_n += np.frombuffer(r["hn"]).reshape(shape)
            node_g = hist_g[:, 0, :].sum(axis=1)
            node_n = hist_n[:, 0, :].sum(axis=1)
            splits = self._best_splits(hist_g, hist_n, node_g, node_n)
            any_split = False
            for k, node_id in enumerate(act):
                nd = nodes[node_id]
                sp = splits[k]
                if sp is None:
                    nd.value = float(node_g[k] / (node_n[k] + self.reg_lambda))
                    continue
                j, b, _g = sp
                nd.feature, nd.bin_threshold = j, b
                nd.left, nd.right = _TreeNode(), _TreeNode()
                nodes.extend([nd.left, nd.right])
                # provisional leaf values from histogram sums (refined if split further)
                gl = hist_g[k, j, : b + 1].sum()
                nl = hist_n[k, j, : b + 1].sum()
                nd.left.value = float(gl / (nl + self.reg_lambda))
                nd.right.value = float(
                    (node_g[k] - gl) / ((node_n[k] - nl) + self.reg_lambda)
                )
                any_split = True
            if not any_split:
                break
        # store serialized form alongside (trees_ holds roots)
        return root

    # serialized-tree helpers are module-level for the Spark closures


def _serialize_nodes(nodes):
    """Flat (feature, bin, left, right, value) arrays; -1 feature = leaf."""
    idx = {id(nd): i for i, nd in enumerate(nodes)}
    arr = []
    for nd in nodes:
        arr.append(
            (
                nd.feature,
                nd.bin_threshold,
                idx[id(nd.left)] if nd.left is not None else -1,
                idx[id(nd.right)] if nd.right is not None else -1,
                nd.value,
            )
        )
    return arr


def _assign_serialized(tree, Xb):
    """Leaf-or-frontier node index per row for a (possibly partial) tree."""
    n = len(Xb)
    node = np.zeros(n, dtype=np.int64)
    changed = True
    while changed:
        changed = False
        for i, (feat, b, left, right, _v) in enumerate(tree):
            if left < 0:
                continue
            sel = node == i
            if not sel.any():
                continue
            go_left = sel & (Xb[:, feat] <= b)
            node[go_left] = left
            node[sel & ~go_left] = right
            changed = True
    return node


def _apply_serialized(tree_root, Xb):
    """Apply a fitted _TreeNode tree (pickled into the closure) to binned X."""
    out = np.empty(len(Xb))
    stack = [(tree_root, np.arange(len(Xb)))]
    while stack:
        nd, idx = stack.pop()
        if nd.left is None:
            out[idx] = nd.value
            continue
        go_left = Xb[idx, nd.feature] <= nd.bin_threshold
        stack.append((nd.left, idx[go_left]))
        stack.append((nd.right, idx[~go_left]))
    return out


# Poisson(1) inverse-CDF thresholds for hash-derived bootstrap weights:
# weight k is drawn when u lands in [cdf(k-1), cdf(k))
_POISSON1_CDF = None


def _poisson1_cdf():
    global _POISSON1_CDF
    if _POISSON1_CDF is None:
        import math

        pmf = [math.exp(-1.0)]
        for k in range(1, 16):
            pmf.append(pmf[-1] / k)
        _POISSON1_CDF = np.cumsum(pmf)
    return _POISSON1_CDF


def _bootstrap_weights(row_ids: np.ndarray, seed: int) -> np.ndarray:
    """Deterministic per-(row, tree) Poisson(1) bootstrap weights — the
    standard distributed-bagging substitute for an explicit bootstrap
    resample (the multiset a bootstrap draws per row IS Poisson(1) in the
    n→∞ limit). splitmix64-style hash of (row_id, seed) → uniform →
    inverse CDF; identical on every pass that sees the row, so the level
    passes of one tree agree on its bootstrap."""
    salt = (seed * 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
    with np.errstate(over="ignore"):
        z = (row_ids.astype(np.uint64) + np.uint64(salt)) * np.uint64(
            0xBF58476D1CE4E5B9
        )
    z ^= z >> np.uint64(27)
    with np.errstate(over="ignore"):
        z *= np.uint64(0x94D049BB133111EB)
    z ^= z >> np.uint64(31)
    u = z.astype(np.float64) / float(2**64)
    return np.searchsorted(_poisson1_cdf(), u).astype(np.float64)


class RandomForest(GradientBoostedTrees):
    """Bagged histogram trees: per-tree Poisson(1) bootstrap, per-tree
    feature subsampling (``max_features`` fraction), variance-reduction
    splits, mean-leaf values, averaged prediction. sklearn-compatible
    surface for the reference's AutoRandomForest space
    (`/root/reference/mlforecast/auto.py:115-124`): ``n_estimators``,
    ``max_depth``, ``min_samples_split``, ``max_features``.

    Scale shape matches the GBT: the local path collects once under
    ``collect_threshold``; the distributed path keeps the quantile-binned
    frame on executors and runs one ``mapInPandas`` histogram pass per
    (tree, level) where only the (nodes × features × bins) partials reach
    the driver. Bagging never materializes a resample — each pass derives
    the row's Poisson weight from a hash of its row id and the tree seed,
    so trees are independent, deterministic, and cost no extra storage.
    Unlike boosting there is no carried prediction column, so trees need
    no per-tree update/checkpoint pass and could even train concurrently."""

    def __init__(
        self,
        n_estimators: int = 100,
        max_depth: int = 10,
        max_bins: int = 64,
        min_samples_split: int = 2,
        min_child_samples: int = 1,
        max_features: float = 1.0,
        criterion: str = "squared_error",
        collect_threshold: int = 2_000_000,
        random_state: int = 0,
    ):
        if criterion != "squared_error":
            # reference space also offers absolute_error; histogram splits
            # are variance-reduction (squared error) here
            raise ValueError(
                "RandomForest supports criterion='squared_error' only"
            )
        super().__init__(
            n_estimators=n_estimators,
            learning_rate=1.0,
            max_depth=max_depth,
            max_bins=max_bins,
            min_child_samples=min_child_samples,
            reg_lambda=0.0,
            collect_threshold=collect_threshold,
            random_state=random_state,
        )
        self.min_samples_split = int(min_samples_split)
        self.max_features = max_features
        self.criterion = criterion

    def _feature_subset(self, rng: np.ndarray, n_features: int):
        k = max(1, int(round(float(self.max_features) * n_features)))
        if k >= n_features:
            return None
        return np.sort(rng.choice(n_features, size=k, replace=False))

    # ------------------------------------------------------------- local
    def fit(self, X, y):
        X = np.asarray(X, dtype=np.float64)
        y = np.asarray(y, dtype=np.float64)
        self._fit_bins(X)
        Xb = self._bin(X)
        rng = np.random.RandomState(self.random_state)
        n, nf = X.shape
        self.base_score_ = 0.0
        self.trees_ = []
        for _t in range(self.n_estimators):
            idx = rng.randint(0, n, size=n)  # bootstrap resample
            self.trees_.append(
                self._grow_tree_local(
                    Xb[idx],
                    y[idx],
                    allowed_features=self._feature_subset(rng, nf),
                    min_samples_split=self.min_samples_split,
                )
            )
        return self

    def predict(self, X) -> np.ndarray:
        X = np.asarray(X, dtype=np.float64)
        Xb = self._bin(X)
        out = np.zeros(len(Xb))
        for tree in self.trees_:
            out += self._apply_tree(tree, Xb)
        return out / max(len(self.trees_), 1)

    # ------------------------------------------------------- distributed
    def fit_spark(self, df, feature_cols: Sequence[str], target_col: str):
        from pyspark.sql import functions as F

        feature_cols = list(feature_cols)
        sel = [
            qcol(c).cast("double").alias(f"_f{i}")
            for i, c in enumerate(feature_cols)
        ]
        sel.append(qcol(target_col).cast("double").alias("_t"))
        data = df.select(*sel).na.drop()
        n_rows = data.count()
        if n_rows <= self.collect_threshold:
            pdf = data.toPandas()
            X = pdf[[f"_f{i}" for i in range(len(feature_cols))]].to_numpy()
            y = pdf["_t"].to_numpy()
            return self.fit(X, y)
        return self._fit_spark_forest(data, len(feature_cols), n_rows)

    def _fit_spark_forest(self, data, n_features: int, n_rows: int):
        from pyspark.sql import functions as F

        data = data.withColumn("_r", F.monotonically_increasing_id()).cache()
        self._fit_bins_from_sample(data, n_features, n_rows)
        # shared binning prep with the boosting path; the forest carries a
        # stable row id (for hash-derived bootstrap weights) instead of a
        # running prediction
        binned = self._binned_frame(data, n_features, {"_r": "_r"})
        data.unpersist()
        self.base_score_ = 0.0
        self.trees_ = []
        rng = np.random.RandomState(self.random_state)
        for t in range(self.n_estimators):
            self.trees_.append(
                self._grow_tree_spark_bagged(
                    binned,
                    n_features,
                    tree_seed=self.random_state + 1 + t,
                    allowed_features=self._feature_subset(rng, n_features),
                )
            )
        return self

    def _grow_tree_spark_bagged(
        self, data, n_features: int, tree_seed: int, allowed_features=None
    ):
        """One forest tree: level-wise weighted histograms where each row's
        bootstrap multiplicity comes from its hashed (_r, tree_seed)."""
        import pandas as pd

        root = _TreeNode()
        nodes = [root]
        mb = self.max_bins

        for _depth in range(self.max_depth):
            act = [
                i
                for i, nd in enumerate(nodes)
                if nd.feature == -1 and nd.left is None
            ]
            if not act:
                break
            tree_struct = _serialize_nodes(nodes)
            act_set = {v: k for k, v in enumerate(act)}
            state = {"cur_tree": tree_struct, "act": act_set}

            def partials(
                batches, state=state, n_features=n_features, mb=mb, ts=tree_seed
            ):
                import pandas as pd

                hg = np.zeros((len(state["act"]), n_features, mb))
                hn = np.zeros((len(state["act"]), n_features, mb))
                for pdf in batches:
                    Xb = np.column_stack(
                        [
                            pdf[f"_b{j}"].to_numpy(dtype="int64")
                            for j in range(n_features)
                        ]
                    )
                    w = _bootstrap_weights(
                        pdf["_r"].to_numpy(dtype="int64"), ts
                    )
                    yv = pdf["_t"].to_numpy(dtype="float64")
                    node_of = _assign_serialized(state["cur_tree"], Xb)
                    compact = np.array(
                        [state["act"].get(v, -1) for v in range(node_of.max() + 1)]
                    )[node_of]
                    selm = (compact >= 0) & (w > 0)
                    cc = compact[selm]
                    wv = w[selm]
                    gy = wv * yv[selm]
                    for j in range(n_features):
                        key = cc * mb + Xb[selm, j]
                        ml = len(state["act"]) * mb
                        hg[:, j, :] += np.bincount(
                            key, weights=gy, minlength=ml
                        ).reshape(-1, mb)
                        hn[:, j, :] += np.bincount(
                            key, weights=wv, minlength=ml
                        ).reshape(-1, mb)
                yield pd.DataFrame(
                    {"hg": [hg.ravel().tobytes()], "hn": [hn.ravel().tobytes()]}
                )

            rows = data.mapInPandas(partials, schema="hg binary, hn binary").collect()
            shape = (len(act), n_features, mb)
            hist_g = np.zeros(shape)
            hist_n = np.zeros(shape)
            for r in rows:
                hist_g += np.frombuffer(r["hg"]).reshape(shape)
                hist_n += np.frombuffer(r["hn"]).reshape(shape)
            node_g = hist_g[:, 0, :].sum(axis=1)
            node_n = hist_n[:, 0, :].sum(axis=1)
            splits = self._best_splits(
                hist_g, hist_n, node_g, node_n,
                allowed_features=allowed_features,
                min_samples_split=self.min_samples_split,
            )
            any_split = False
            for k, node_id in enumerate(act):
                nd = nodes[node_id]
                sp = splits[k]
                if sp is None:
                    if node_n[k] > 0:
                        nd.value = float(node_g[k] / node_n[k])
                    continue
                j, b, _g = sp
                nd.feature, nd.bin_threshold = j, b
                nd.left, nd.right = _TreeNode(), _TreeNode()
                nodes.extend([nd.left, nd.right])
                gl = hist_g[k, j, : b + 1].sum()
                nl = hist_n[k, j, : b + 1].sum()
                if nl > 0:
                    nd.left.value = float(gl / nl)
                nr = node_n[k] - nl
                if nr > 0:
                    nd.right.value = float((node_g[k] - gl) / nr)
                any_split = True
            if not any_split:
                break
        return root


def _tree_to_column(node, xs, bin_edges):
    """Binned tree walk as a JVM CASE cascade on RAW values: binning is
    monotone, so ``bin(x) <= b``  ⇔  ``x < edges[b]`` (searchsorted
    side='right' counts edges <= x), and the per-row Python walk becomes a
    codegen-able expression."""
    from pyspark.sql import functions as F

    if node.left is None:
        return F.lit(float(node.value))
    edges = bin_edges[node.feature]
    left = _tree_to_column(node.left, xs, bin_edges)
    right = _tree_to_column(node.right, xs, bin_edges)
    b = node.bin_threshold
    if b >= len(edges):
        return left  # every binned value fits: the split is degenerate-true
    return F.when(xs[node.feature] < float(edges[b]), left).otherwise(right)


def _score_columns(model, feature_cols):
    """JVM scoring expressions for a tree ensemble; nulls and NaNs map to
    0.0 exactly like the numpy path's nan_to_num (bit-exact equivalence is
    pinned in tests).

    NOT the default scoring path, on purpose — measured NEGATIVE result
    (local[32], 1.3M rows, 50 trees × depth 5): the CASE cascade scores in
    6.2 s warm vs 0.7 s for the Arrow pandas-UDF numpy walk, because the
    ~1550-WHEN method exceeds janino's 64KB codegen limit and falls back
    to interpreted expression evaluation, while the numpy path bins once
    and walks all trees vectorized. Use only where Python workers are
    unavailable or the ensemble is tiny (e.g. exporting a depth-2 stump
    ensemble into a pure-SQL pipeline)."""
    from pyspark.sql import functions as F

    from .utils import qcol

    xs = []
    for c in feature_cols:
        x = qcol(c).cast("double")
        xs.append(
            F.when(x.isNull() | F.isnan(x), F.lit(0.0)).otherwise(x)
        )
    return [
        _tree_to_column(t, xs, model.bin_edges_) for t in model.trees_
    ]
