"""Deterministic synthetic MovieLens-style raw dataframes.

The real pipeline downloads ml-latest-small from grouplens and enriches it
via the OMDB web API (reference: parser/ml.py:9-99) — neither is reachable
from a zero-egress TPU pod, and tests must not depend on downloads anyway.
This generator emits dataframes with the *exact schema* the raw parser
produces (movies: iid/title/year/<genre bools>/directors/actors/writers;
ratings: uid/iid/rating/timestamp; tagging: uid/iid/tag/timestamp) so the
full build pipeline (filtering → reindex → HIN) is exercised end-to-end.

Scale roughly mirrors ml-latest-small post-filtering shape at `scale=1.0`
(reference published setup: ~610 users, ~2.2k movies, num_core=10).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

GENRES = [
    "Action", "Adventure", "Animation", "Comedy", "Crime", "Documentary",
    "Drama", "Fantasy", "Horror", "Mystery", "Romance", "Sci-Fi", "Thriller",
    "War",
]


def synthetic_mlsmall_raw(
    seed=0,
    num_users=150,
    num_items=120,
    min_ratings_per_user=8,
    max_ratings_per_user=30,
    num_directors=25,
    num_actors=60,
    num_writers=30,
    num_tags=40,
    tagging_rows=400,
):
    """Returns (movies, ratings, tagging) dataframes in raw-parser schema."""
    rng = np.random.default_rng(seed)

    # movies: popularity-skewed genre/crew assignment
    rows = []
    for iid in range(1, num_items + 1):
        year = int(rng.integers(1930, 2020))
        row = {"iid": iid, "title": f"Movie {iid}", "year": year}
        for gname in GENRES:
            row[gname] = bool(rng.random() < 0.18)
        row["directors"] = ",".join(
            f"Director{int(x)}" for x in rng.choice(num_directors, size=rng.integers(1, 3), replace=False)
        )
        row["actors"] = ",".join(
            f"Actor{int(x)}" for x in rng.choice(num_actors, size=rng.integers(1, 5), replace=False)
        )
        row["writers"] = ",".join(
            f"Writer{int(x)}" for x in rng.choice(num_writers, size=rng.integers(1, 3), replace=False)
        )
        rows.append(row)
    movies = pd.DataFrame(rows).fillna(False)

    # ratings: zipf-ish item popularity, per-user leave-one-out-able histories
    item_pop = rng.dirichlet(np.ones(num_items) * 0.3)
    r_rows = []
    ts = 1_000_000
    for uid in range(1, num_users + 1):
        k = int(rng.integers(min_ratings_per_user, max_ratings_per_user + 1))
        iids = rng.choice(np.arange(1, num_items + 1), size=min(k, num_items), replace=False, p=item_pop)
        for iid in iids:
            ts += int(rng.integers(1, 50))
            r_rows.append(
                {
                    "uid": uid,
                    "iid": int(iid),
                    "rating": float(rng.choice([2.0, 3.0, 3.5, 4.0, 4.5, 5.0])),
                    "timestamp": ts,
                }
            )
    ratings = pd.DataFrame(r_rows)

    # tagging
    t_rows = []
    for _ in range(tagging_rows):
        r = ratings.iloc[int(rng.integers(0, len(ratings)))]
        t_rows.append(
            {
                "uid": int(r.uid),
                "iid": int(r.iid),
                "tag": f"tag{int(rng.integers(0, num_tags))}",
                "timestamp": int(r.timestamp) + 1,
            }
        )
    tagging = pd.DataFrame(t_rows).drop_duplicates()

    return movies, ratings, tagging
