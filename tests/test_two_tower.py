"""Two-tower model: training, loss behavior, serving integration."""

import numpy as np
import pytest

from spotify_recommender_tpu.core.config import MeshConfig, TwoTowerConfig
from spotify_recommender_tpu.core.mesh import make_mesh
from spotify_recommender_tpu.models import two_tower


@pytest.fixture(scope="module")
def clustered_data():
    """Features with clear genre clusters so same-genre pairs are learnable."""
    rng = np.random.default_rng(0)
    n, g = 400, 4
    genre_ids = np.repeat(np.arange(g), n // g).astype(np.int32)
    centers = rng.random((g, 12)).astype(np.float32)
    feats = centers[genre_ids] + 0.05 * rng.standard_normal((n, 12)).astype(
        np.float32
    )
    return feats.astype(np.float32), genre_ids


SMALL = TwoTowerConfig(
    embedding_dim=16, hidden_dims=(32,), batch_size=64, num_steps=150,
    learning_rate=3e-3, seed=0,
)


class TestTraining:
    def test_loss_decreases(self, clustered_data):
        feats, genres = clustered_data
        result = two_tower.train(feats, genres, SMALL)
        assert result.losses[-1] < result.losses[0]

    def test_learned_embeddings_cluster_by_genre(self, clustered_data):
        feats, genres = clustered_data
        result = two_tower.train(feats, genres, SMALL)
        emb = two_tower.embed_catalog(result.params, feats, SMALL)
        # mean intra-genre similarity must exceed inter-genre
        sims = emb @ emb.T
        same = genres[:, None] == genres[None, :]
        intra = sims[same & ~np.eye(len(feats), dtype=bool)].mean()
        inter = sims[~same].mean()
        assert intra > inter + 0.2, (intra, inter)

    def test_embeddings_unit_norm(self, clustered_data):
        feats, genres = clustered_data
        cfg = TwoTowerConfig(embedding_dim=8, hidden_dims=(16,), batch_size=32,
                             num_steps=3)
        result = two_tower.train(feats, genres, cfg)
        emb = two_tower.embed_catalog(result.params, feats, cfg)
        np.testing.assert_allclose(
            np.linalg.norm(emb, axis=1), 1.0, rtol=1e-5
        )


class TestDataParallel:
    def test_dp_train_step_runs(self, clustered_data):
        feats, genres = clustered_data
        mesh = make_mesh(MeshConfig(data=8, catalog=1))
        cfg = TwoTowerConfig(
            embedding_dim=8, hidden_dims=(16,), batch_size=64, num_steps=5,
        )
        result = two_tower.train(feats, genres, cfg, mesh=mesh)
        assert np.isfinite(result.losses[-1])

    def test_dp_matches_single_device_loss_scale(self, clustered_data):
        # dp and single-device runs should land in the same loss ballpark
        feats, genres = clustered_data
        cfg = TwoTowerConfig(
            embedding_dim=8, hidden_dims=(16,), batch_size=64, num_steps=30,
            seed=3,
        )
        single = two_tower.train(feats, genres, cfg)
        mesh = make_mesh(MeshConfig(data=8, catalog=1))
        dp = two_tower.train(feats, genres, cfg, mesh=mesh)
        assert abs(single.losses[-1] - dp.losses[-1]) < 1.0

    def test_dryrun_hook(self):
        mesh = make_mesh(MeshConfig(data=1, catalog=8))
        two_tower.dryrun_train_step(mesh)


class TestServingIntegration:
    def test_retrieval_with_learned_embeddings(self, clustered_data):
        from spotify_recommender_tpu.ops.similarity import exact_topk
        import jax.numpy as jnp

        feats, genres = clustered_data
        result = two_tower.train(feats, genres, SMALL)
        item_emb = two_tower.embed_catalog(result.params, feats, SMALL)
        q_emb = two_tower.embed_queries(result.params, feats[:8], SMALL)
        scores, rows = exact_topk(
            jnp.asarray(q_emb), jnp.asarray(item_emb), k=10,
            exclude_rows=jnp.arange(8, dtype=jnp.int32),
        )
        rows = np.asarray(rows)
        # retrieved neighbors should be dominated by the query's own genre
        for b in range(8):
            same = (genres[rows[b]] == genres[b]).mean()
            assert same > 0.6, (b, same)


class TestModelIO:
    def test_save_load_round_trip(self, tmp_path, clustered_data):
        feats, genres = clustered_data
        cfg = TwoTowerConfig(embedding_dim=8, hidden_dims=(16,), num_steps=2,
                             batch_size=16)
        result = two_tower.train(feats, genres, cfg)
        p = str(tmp_path / "tt.pkl")
        two_tower.save_model(p, result.params, cfg)
        params, cfg2 = two_tower.load_model(p)
        e1 = two_tower.embed_catalog(result.params, feats[:10], cfg)
        e2 = two_tower.embed_catalog(params, feats[:10], cfg2)
        np.testing.assert_allclose(e1, e2, rtol=1e-6)


class TestUserProfile:
    def test_profile_embedding_retrieves_genre(self, clustered_data):
        feats, genres = clustered_data
        result = two_tower.train(feats, genres, SMALL)
        # user who liked 5 genre-2 songs
        liked = feats[genres == 2][:5]
        emb = two_tower.embed_user_profile(result.params, liked, SMALL)
        assert emb.shape == (SMALL.embedding_dim,)
        item_emb = two_tower.embed_catalog(result.params, feats, SMALL)
        import jax.numpy as jnp
        from spotify_recommender_tpu.ops.similarity import topk_scores

        scores = jnp.asarray(emb[None] @ item_emb.T)
        _, rows = topk_scores(scores, 10)
        hit_genres = genres[np.asarray(rows)[0]]
        assert (hit_genres == 2).mean() > 0.7

    def test_weighted_profile(self, clustered_data):
        feats, genres = clustered_data
        cfg = TwoTowerConfig(embedding_dim=8, hidden_dims=(16,), num_steps=2,
                             batch_size=16)
        result = two_tower.train(feats, genres, cfg)
        emb = two_tower.embed_user_profile(
            result.params, feats[:3], cfg, weights=np.asarray([1.0, 2.0, 0.5])
        )
        assert np.isfinite(emb).all()

    def test_empty_history_rejected(self, clustered_data):
        feats, genres = clustered_data
        cfg = TwoTowerConfig(embedding_dim=8, hidden_dims=(16,), num_steps=2,
                             batch_size=16)
        result = two_tower.train(feats, genres, cfg)
        with pytest.raises(ValueError):
            two_tower.embed_user_profile(
                result.params, np.zeros((0, 12), np.float32), cfg
            )


class TestCheckpointResume:
    def test_resume_continues_from_checkpoint(self, tmp_path, clustered_data):
        feats, genres = clustered_data
        cfg = TwoTowerConfig(embedding_dim=8, hidden_dims=(16,), num_steps=6,
                             batch_size=32, seed=5)
        d = str(tmp_path / "ck")
        # first run: checkpoints every 2 steps
        r1 = two_tower.train(feats, genres, cfg, checkpoint_dir=d,
                             checkpoint_every=2)
        # second run resumes at latest (step 5 saved) and trains 0 new steps
        r2 = two_tower.train(feats, genres, cfg, checkpoint_dir=d,
                             checkpoint_every=2)
        e1 = two_tower.embed_catalog(r1.params, feats[:4], cfg)
        e2 = two_tower.embed_catalog(r2.params, feats[:4], cfg)
        np.testing.assert_allclose(e1, e2, rtol=1e-6)

    def test_resume_trains_remaining_steps(self, tmp_path, clustered_data):
        feats, genres = clustered_data
        d = str(tmp_path / "ck2")
        short = TwoTowerConfig(embedding_dim=8, hidden_dims=(16,), num_steps=3,
                               batch_size=32, seed=5)
        two_tower.train(feats, genres, short, checkpoint_dir=d,
                        checkpoint_every=1)
        longer = TwoTowerConfig(embedding_dim=8, hidden_dims=(16,), num_steps=8,
                                batch_size=32, seed=5)
        r = two_tower.train(feats, genres, longer, checkpoint_dir=d,
                            checkpoint_every=1)
        assert np.isfinite(r.losses[-1])


class TestColistenPairs:
    def test_colisten_learns_item_affinity(self):
        """Users listen within one of two item clusters; co-listen training
        must embed same-cluster items closer than cross-cluster."""
        from spotify_recommender_tpu.models import mf

        rng = np.random.default_rng(0)
        n_items = 200
        # features are random (no genre signal) and directionally spread;
        # the ONLY structure is in who co-listens to what
        feats = rng.standard_normal((n_items, 12)).astype(np.float32)
        cluster = (np.arange(n_items) >= n_items // 2).astype(int)
        users, items = [], []
        for u in range(300):
            c = u % 2
            pool = np.flatnonzero(cluster == c)
            its = rng.choice(pool, size=6, replace=False)
            users.extend([u] * 6)
            items.extend(its)
        inter = mf.Interactions.from_coo(
            np.asarray(users), np.asarray(items),
            np.ones(len(users), np.float32), 300, n_items,
        )
        cfg = TwoTowerConfig(embedding_dim=16, hidden_dims=(64,), batch_size=128,
                             num_steps=800, learning_rate=1e-2,
                             temperature=0.2, seed=0)
        pair_fn = two_tower.colisten_pair_fn(inter, feats, rng)
        result = two_tower.train(feats, np.zeros(n_items, np.int32), cfg,
                                 pair_fn=pair_fn)
        emb = two_tower.embed_catalog(result.params, feats, cfg)
        sims = emb @ emb.T
        same = cluster[:, None] == cluster[None, :]
        intra = sims[same & ~np.eye(n_items, dtype=bool)].mean()
        inter_sim = sims[~same].mean()
        assert intra > inter_sim + 0.1, (intra, inter_sim)

    def test_requires_multi_item_users(self):
        from spotify_recommender_tpu.models import mf

        inter = mf.Interactions.from_coo(
            np.asarray([0, 1]), np.asarray([0, 1]),
            np.ones(2, np.float32), 2, 2,
        )
        with pytest.raises(ValueError, match=">= 2"):
            two_tower.colisten_pair_fn(
                inter, np.zeros((2, 12), np.float32), np.random.default_rng(0)
            )


class TestMixedPrecision:
    def test_bf16_compute_learns(self):
        import numpy as np

        from spotify_recommender_tpu.core.config import TwoTowerConfig
        from spotify_recommender_tpu.models import two_tower

        rng = np.random.default_rng(0)
        feats = rng.random((300, 12)).astype(np.float32)
        genres = rng.integers(0, 4, size=300).astype(np.int32)
        cfg = TwoTowerConfig(
            embedding_dim=16, hidden_dims=(32,), num_steps=60,
            batch_size=64, compute_dtype="bfloat16",
        )
        res = two_tower.train(feats, genres, cfg)
        assert res.losses[-1] < res.losses[0]
        emb = two_tower.embed_catalog(res.params, feats, cfg)
        assert emb.dtype == np.float32
        assert np.isfinite(emb).all()
        np.testing.assert_allclose(
            np.linalg.norm(emb, axis=1), 1.0, rtol=1e-3
        )
        # params stay fp32 master weights
        import jax

        assert all(
            p.dtype == np.float32
            for p in jax.tree_util.tree_leaves(res.params)
        )

    def test_bf16_model_roundtrips_through_artifact(self, tmp_path):
        import numpy as np

        from spotify_recommender_tpu.core.config import TwoTowerConfig
        from spotify_recommender_tpu.models import two_tower

        rng = np.random.default_rng(1)
        feats = rng.random((100, 12)).astype(np.float32)
        genres = rng.integers(0, 3, size=100).astype(np.int32)
        cfg = TwoTowerConfig(embedding_dim=8, hidden_dims=(16,),
                             num_steps=5, batch_size=16,
                             compute_dtype="bfloat16")
        res = two_tower.train(feats, genres, cfg)
        path = str(tmp_path / "tt_bf16.model")
        two_tower.save_model(path, res.params, cfg)
        params2, cfg2 = two_tower.load_model(path)
        assert cfg2.compute_dtype == "bfloat16"
        a = two_tower.embed_catalog(res.params, feats, cfg)
        b = two_tower.embed_catalog(params2, feats, cfg2)
        np.testing.assert_allclose(a, b, rtol=1e-5)


class TestItemMagnitude:
    def test_normalize_items_false_keeps_magnitude(self):
        import jax
        import jax.numpy as jnp

        from spotify_recommender_tpu.core.config import TwoTowerConfig
        from spotify_recommender_tpu.models.two_tower import TwoTower

        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.random((16, 12), dtype=np.float32))
        for norm_items, expect_unit in [(True, True), (False, False)]:
            cfg = TwoTowerConfig(
                embedding_dim=8, hidden_dims=(16,),
                normalize_items=norm_items,
            )
            model = TwoTower(cfg)
            params = model.init(jax.random.PRNGKey(0), x, x)
            i_emb = model.apply(params, x, method=TwoTower.embed_item)
            q_emb = model.apply(params, x, method=TwoTower.embed_query)
            norms_i = np.linalg.norm(np.asarray(i_emb), axis=1)
            # query tower is ALWAYS unit-norm
            np.testing.assert_allclose(
                np.linalg.norm(np.asarray(q_emb), axis=1), 1.0, atol=1e-5
            )
            if expect_unit:
                np.testing.assert_allclose(norms_i, 1.0, atol=1e-5)
            else:
                assert np.std(norms_i) > 1e-4   # magnitudes differ
