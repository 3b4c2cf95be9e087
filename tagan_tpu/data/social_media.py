"""Synthetic social-media conversation pipeline.

Port of the reference's two-stage pipeline *semantics*:

* ``SocialMediaDataGenerator``
  (`/root/reference/synthetic_social_media_data.py:26-308`): users with
  interests/activity, conversation threads with reply trees, timed gaps
  (a 4-8h jump every 3rd post so threads span multiple snapshots,
  :231-236), controversial label per thread with sentiment-loaded text.
  The reference uses Faker for filler text; this version draws from
  built-in word banks (Faker is not in this image) — the statistical
  structure (topics, sentiment-word injection, reply fragments) is the
  same.

* ``SocialMediaGraphProcessor``
  (`/root/reference/preprocess_social_media.py:29-503`): TF-IDF(1000)
  -> TruncatedSVD(16) -> L2-normalized text embeddings (:96-133), reply
  edges parent-author -> reply-author (:159-197), node attrs =
  [activity, age/100, posts/10] (+) text embedding (+) interest one-hot
  (:199-268), snapshot binning via `preprocess_temporal_graph` (the
  module the reference imports but never shipped — bug B1), thread
  grouping with a minimum snapshot count (:371-409), 70/15/15 split
  (:423-444).
"""

from __future__ import annotations

import json
import os
import random
from datetime import datetime, timedelta
from typing import Any, Dict, List, Optional, Tuple

import numpy as np

from .dataset import TemporalGraphDataset
from .preprocess import preprocess_temporal_graph

TOPICS = ["technology", "politics", "sports", "entertainment",
          "science", "health", "environment", "business"]

POSITIVE = ["love", "great", "excellent", "amazing", "wonderful",
            "brilliant", "fantastic", "outstanding", "terrific", "superb",
            "happy", "joy"]
NEGATIVE = ["hate", "terrible", "awful", "horrible", "disappointing",
            "poor", "bad", "mediocre", "frustrating", "annoying", "angry",
            "sad"]
NEUTRAL = ["okay", "fine", "average", "moderate", "reasonable", "fair",
           "acceptable", "decent", "standard", "normal", "common",
           "regular"]
CONTROVERSIAL = ["disagree", "argument", "debate", "wrong", "false",
                 "incorrect", "misleading", "biased", "unfair",
                 "controversial", "dispute", "conflict"]

_FILLER = ("the quick brown fox jumps over lazy dog while people discuss "
           "ideas about data systems models news events results games "
           "research studies markets policy nature energy community "
           "culture media progress change today tomorrow").split()


class SocialMediaDataGenerator:
    """Synthetic conversation-thread generator (reference :26-308)."""

    def __init__(self, num_users: int = 50, num_threads: int = 20,
                 max_posts_per_thread: int = 15,
                 max_replies_per_post: int = 5, time_span_days: int = 5,
                 controversial_ratio: float = 0.3,
                 output_dir: Optional[str] = None, seed: int = 0):
        self.num_users = num_users
        self.num_threads = num_threads
        self.max_posts_per_thread = max_posts_per_thread
        self.max_replies_per_post = max_replies_per_post
        self.time_span_days = time_span_days
        self.controversial_ratio = controversial_ratio
        self.output_dir = output_dir
        self.rng = random.Random(seed)
        self.users = self._generate_users()

    def _generate_users(self) -> List[Dict[str, Any]]:
        users = []
        for i in range(self.num_users):
            users.append({
                "user_id": f"user_{i}",
                "name": f"User {i}",
                "age": self.rng.randint(18, 70),
                "interests": self.rng.sample(
                    TOPICS, self.rng.randint(1, 3)),
                "activity_level": self.rng.choice(
                    ["low", "medium", "high"]),
            })
        return users

    def _sentence(self) -> str:
        n = self.rng.randint(5, 10)
        return " ".join(self.rng.choices(_FILLER, k=n)) + "."

    def _post_content(self, is_controversial: bool, is_reply: bool = False,
                      parent_content: Optional[str] = None) -> str:
        if is_reply and parent_content and self.rng.random() < 0.3:
            opening = self.rng.choice([
                "I agree that ", "I disagree that ", "You're right about ",
                "I don't think ", "Interesting point about ", "Regarding "])
            words = parent_content.split()
            frag = " ".join(self.rng.sample(words, min(5, len(words)))) \
                if len(words) > 5 else parent_content
            content = opening + frag + ". "
        elif not is_reply:
            content = f"[{self.rng.choice(TOPICS).upper()}] "
        else:
            content = ""
        for _ in range(self.rng.randint(1, 3)):
            content += self._sentence() + " "
        if is_controversial:
            words = self.rng.sample(POSITIVE + NEGATIVE + CONTROVERSIAL,
                                    self.rng.randint(1, 3))
        else:
            words = self.rng.sample(POSITIVE + NEUTRAL,
                                    self.rng.randint(0, 2))
        if words:
            content += " I feel " + " and ".join(words) + " about this. "
        return content

    def generate_data(self) -> List[Dict[str, Any]]:
        """Returns post rows (list of dicts; convertible to a DataFrame).
        Reply-tree and timing structure mirror reference :180-258."""
        posts: List[Dict[str, Any]] = []
        pid = 0
        now = datetime(2025, 1, 10, 12, 0, 0)
        for thread_id in range(self.num_threads):
            is_controversial = self.rng.random() < self.controversial_ratio
            start = now - timedelta(days=self.rng.uniform(
                self.time_span_days * 0.5, self.time_span_days))
            if is_controversial:
                n_posts = self.rng.randint(
                    max(10, self.max_posts_per_thread // 2),
                    self.max_posts_per_thread)
            else:
                n_posts = self.rng.randint(
                    max(5, self.max_posts_per_thread // 4),
                    max(self.max_posts_per_thread // 2,
                        self.max_posts_per_thread // 4 + 1))
            starter_user = self.rng.choice(self.users)
            posts.append({
                "post_id": pid, "thread_id": thread_id,
                "user_id": starter_user["user_id"],
                "content": self._post_content(is_controversial),
                "timestamp": start, "parent_id": None,
                "controversial": int(is_controversial)})
            thread_posts = [posts[-1]]
            pid += 1
            for i in range(1, n_posts):
                parent = self.rng.choice(thread_posts)
                others = [u for u in self.users
                          if u["user_id"] != parent["user_id"]]
                user = self.rng.choice(others)
                if i % 3 == 0:   # big gap every 3rd post (:231-236)
                    t = parent["timestamp"] + timedelta(
                        hours=self.rng.randint(4, 8))
                else:
                    t = parent["timestamp"] + timedelta(
                        minutes=self.rng.randint(5, 180))
                posts.append({
                    "post_id": pid, "thread_id": thread_id,
                    "user_id": user["user_id"],
                    "content": self._post_content(
                        is_controversial, is_reply=True,
                        parent_content=parent["content"]),
                    "timestamp": t, "parent_id": parent["post_id"],
                    "controversial": int(is_controversial)})
                thread_posts.append(posts[-1])
                pid += 1

        if self.output_dir:
            os.makedirs(self.output_dir, exist_ok=True)
            with open(os.path.join(self.output_dir,
                                   "social_media_data.json"), "w") as f:
                json.dump([{**p, "timestamp":
                            p["timestamp"].strftime("%Y-%m-%d %H:%M:%S")}
                           for p in posts], f)
            with open(os.path.join(self.output_dir,
                                   "user_profiles.json"), "w") as f:
                json.dump(self.users, f, indent=2)
        return posts

    def analyze_data(self, posts) -> Dict[str, Any]:
        """Statistics (reference :279-308) — returned, not printed."""
        threads: Dict[int, int] = {}
        for p in posts:
            threads[p["thread_id"]] = threads.get(p["thread_id"], 0) + 1
        return {
            "total_users": self.num_users,
            "total_threads": len(threads),
            "total_posts": len(posts),
            "thread_starters": sum(p["parent_id"] is None for p in posts),
            "replies": sum(p["parent_id"] is not None for p in posts),
            "controversial_threads": len(
                {p["thread_id"] for p in posts if p["controversial"]}),
            "avg_posts_per_thread": float(np.mean(list(threads.values()))),
        }


class SocialMediaGraphProcessor:
    """Posts -> per-thread temporal graph sequences
    (reference preprocess_social_media.py:29-503)."""

    def __init__(self, embedding_dim: int = 16, max_features: int = 1000,
                 snapshot_duration: float = 4 * 3600.0,
                 max_snapshots: int = 10, min_snapshots: int = 2,
                 normalize_features: bool = True):
        self.embedding_dim = embedding_dim
        self.max_features = max_features
        self.snapshot_duration = snapshot_duration
        self.max_snapshots = max_snapshots
        self.min_snapshots = min_snapshots
        self.normalize_features = normalize_features

    # -- text embeddings: TF-IDF -> SVD -> normalize (:96-133) ----------
    def _text_embeddings(self, posts) -> Dict[str, np.ndarray]:
        from sklearn.decomposition import TruncatedSVD
        from sklearn.feature_extraction.text import TfidfVectorizer
        from sklearn.preprocessing import normalize

        by_user: Dict[str, List[str]] = {}
        for p in posts:
            by_user.setdefault(p["user_id"], []).append(p["content"])
        users = sorted(by_user)
        docs = [" ".join(by_user[u]) for u in users]
        tfidf = TfidfVectorizer(max_features=self.max_features)
        m = tfidf.fit_transform(docs)
        k = min(self.embedding_dim, max(m.shape[1] - 1, 1))
        svd = TruncatedSVD(n_components=k, random_state=0)
        emb = svd.fit_transform(m)
        if emb.shape[1] < self.embedding_dim:
            emb = np.pad(emb,
                         ((0, 0), (0, self.embedding_dim - emb.shape[1])))
        emb = normalize(emb)
        return {u: emb[i].astype(np.float32) for i, u in enumerate(users)}

    # -- node attributes (:199-268) --------------------------------------
    def _node_features(self, posts, users) -> Dict[str, np.ndarray]:
        emb = self._text_embeddings(posts)
        post_counts: Dict[str, int] = {}
        for p in posts:
            post_counts[p["user_id"]] = post_counts.get(p["user_id"], 0) + 1
        act_map = {"low": 0.0, "medium": 0.5, "high": 1.0}
        feats = {}
        for u in users:
            uid = u["user_id"]
            base = np.asarray([
                act_map.get(u.get("activity_level", "medium"), 0.5),
                u.get("age", 35) / 100.0,
                post_counts.get(uid, 0) / 10.0], np.float32)
            one_hot = np.asarray(
                [1.0 if t in u.get("interests", []) else 0.0
                 for t in TOPICS], np.float32)
            e = emb.get(uid, np.zeros(self.embedding_dim, np.float32))
            feats[uid] = np.concatenate([base, e, one_hot])
        return feats

    @property
    def node_feature_dim(self) -> int:
        return 3 + self.embedding_dim + len(TOPICS)

    def process_data(self, posts, users) -> Tuple[TemporalGraphDataset,
                                                  TemporalGraphDataset,
                                                  TemporalGraphDataset]:
        """Full pipeline -> (train, val, test) datasets of
        (snapshot sequence, controversial label)."""
        node_feats = self._node_features(posts, users)
        uid_to_idx = {u["user_id"]: i for i, u in enumerate(users)}
        by_post = {p["post_id"]: p for p in posts}

        sequences, labels = [], []
        threads: Dict[int, List[dict]] = {}
        for p in posts:
            threads.setdefault(p["thread_id"], []).append(p)

        for tid, tposts in sorted(threads.items()):
            # reply edges: parent author -> reply author (:159-197)
            rows = {"timestamp": [], "source": [], "target": []}
            for p in tposts:
                if p["parent_id"] is None:
                    continue
                parent = by_post[p["parent_id"]]
                rows["timestamp"].append(
                    p["timestamp"].timestamp()
                    if isinstance(p["timestamp"], datetime)
                    else float(p["timestamp"]))
                rows["source"].append(uid_to_idx[parent["user_id"]])
                rows["target"].append(uid_to_idx[p["user_id"]])
            if not rows["timestamp"]:
                continue
            attr_by_idx = {uid_to_idx[u]: node_feats[u]
                           for u in uid_to_idx}
            snaps = preprocess_temporal_graph(
                rows, snapshot_duration=self.snapshot_duration,
                max_snapshots=self.max_snapshots,
                node_attr_cols=attr_by_idx,
                normalize_features=self.normalize_features)
            # min snapshots, relaxed to 1 like the reference (:371-409)
            min_needed = self.min_snapshots
            if len(snaps) < min_needed:
                if len(snaps) >= 1:
                    min_needed = 1
                else:
                    continue
            if len(snaps) >= min_needed:
                sequences.append(snaps)
                labels.append(float(tposts[0]["controversial"]))

        ds = TemporalGraphDataset(sequences, labels)
        return ds.split((0.7, 0.15, 0.15), seed=42)
