"""Sharded catalog artifact (Orbax/TensorStore OCDBT) for multi-host
catalogs beyond one chip's (or one host's) memory.

The single-host formats (data/catalog.py: npz, memmap dir, legacy
``songs_data.bin``) all assume one process can hold or map the whole
feature matrix.  At multi-host scale (reference ARCHITECTURE.md:305-309
stops at the single-GPU memory wall) the artifact itself must be sharded:
each host writes/reads ONLY its row shard, straight to/from its devices.

This module stores the numeric columns (features, norms, genre_ids)
through Orbax's OCDBT TensorStore driver — a chunked, checksummed,
concurrently-readable key-value store — and restores them **directly onto
a ``jax.sharding.Mesh``** via abstract-array templates carrying
``NamedSharding``: every process materializes only its addressable
shards.  String metadata (track ids/names/artists) and the genre map ride
a JSON/npy sidecar: they are host-side lookup concerns (query resolution,
display) and never touch the device path.

Rows are padded at save time to ``shard_multiple`` so any power-of-two
mesh axis up to that multiple divides the global shape (JAX sharding
requires divisibility); ``num_items`` in the sidecar marks the true row
count and pad rows are zero (they score 0 and are masked by ``valid``
counts downstream, the same convention as every kernel layout here).
"""

from __future__ import annotations

import json
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from spotify_recommender_tpu.core.logging import get_logger

log = get_logger(__name__)

SHARDED_FORMAT_VERSION = 1
_NUMERIC = ("features", "norms", "genre_ids")


def _pad_rows(x: np.ndarray, multiple: int) -> np.ndarray:
    pad = (-x.shape[0]) % multiple
    if not pad:
        return x
    return np.concatenate(
        [x, np.zeros((pad,) + x.shape[1:], x.dtype)], axis=0
    )


def save_sharded_catalog(
    catalog,
    path: str,
    shard_multiple: int = 4096,
) -> None:
    """Write the OCDBT sharded artifact + metadata sidecar.

    `catalog` is a data.catalog.Catalog (host arrays).  Numeric columns
    are zero-padded to `shard_multiple` rows and written through Orbax;
    strings + scalars go to the sidecar.
    """
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    os.makedirs(path, exist_ok=True)
    tree = {
        "features": _pad_rows(
            np.asarray(catalog.features, np.float32), shard_multiple
        ),
        "norms": _pad_rows(
            np.asarray(catalog.norms, np.float32), shard_multiple
        ),
        "genre_ids": _pad_rows(
            np.asarray(catalog.genre_ids, np.int32), shard_multiple
        ),
    }
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.join(path, "arrays"), tree)
    ckptr.wait_until_finished()
    np.save(
        os.path.join(path, "track_ids.npy"),
        np.asarray(catalog.track_ids, dtype=np.str_),
    )
    np.save(
        os.path.join(path, "track_names.npy"),
        np.asarray(catalog.track_names, dtype=np.str_),
    )
    np.save(
        os.path.join(path, "artists.npy"),
        np.asarray(catalog.artists, dtype=np.str_),
    )
    np.save(os.path.join(path, "min_vals.npy"), catalog.min_vals)
    np.save(os.path.join(path, "max_vals.npy"), catalog.max_vals)
    meta = {
        "format_version": SHARDED_FORMAT_VERSION,
        "layout": "ocdbt-v1",
        "num_items": len(catalog),
        "padded_rows": int(tree["features"].shape[0]),
        "feature_dim": int(catalog.features.shape[1]),
        "shard_multiple": shard_multiple,
        "num_genres": catalog.num_genres,
        "genre_names": list(catalog.genre_names),
    }
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump(meta, f)
    log.info(
        "sharded catalog saved (ocdbt): %s (%d items -> %d padded rows)",
        path, len(catalog), meta["padded_rows"],
    )


class ShardedCatalogArtifact:
    """Restored sharded catalog: device-sharded numeric arrays + host
    metadata.  `features`/`norms`/`genre_ids` are jax Arrays row-sharded
    over the mesh axis (each process holds only its addressable shards);
    `num_items` is the true row count (<= the padded global shape)."""

    def __init__(self, features, norms, genre_ids, meta, path):
        self.features = features
        self.norms = norms
        self.genre_ids = genre_ids
        self.num_items = meta["num_items"]
        self.feature_dim = meta["feature_dim"]
        self.genre_names = [str(g) for g in meta["genre_names"]]
        self.meta = meta
        self._path = path

    def __len__(self) -> int:
        return self.num_items

    # host-side metadata loads lazily: query resolution / display only
    def host_column(self, name: str) -> np.ndarray:
        return np.load(
            os.path.join(self._path, f"{name}.npy"), allow_pickle=False
        )


def load_sharded_catalog(
    path: str,
    mesh: Optional[Mesh] = None,
    axis_name: str = "catalog",
) -> ShardedCatalogArtifact:
    """Restore the artifact.  With a mesh, numeric columns come back as
    jax Arrays with ``NamedSharding(mesh, P(axis_name[, None]))`` — each
    process reads only its shards from the OCDBT store.  Without a mesh,
    they restore to single-device arrays (small-catalog convenience)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with open(os.path.join(path, "meta.json")) as f:
        meta = json.load(f)
    if meta["format_version"] > SHARDED_FORMAT_VERSION:
        raise ValueError(
            f"sharded catalog {path} has format v{meta['format_version']}, "
            f"this build reads <= v{SHARDED_FORMAT_VERSION}"
        )
    rows, f = meta["padded_rows"], meta["feature_dim"]
    if mesh is not None:
        n_shards = mesh.shape[axis_name]
        if rows % n_shards:
            raise ValueError(
                f"padded rows {rows} not divisible by mesh axis "
                f"{axis_name}={n_shards}; re-save with shard_multiple a "
                f"multiple of it"
            )
        sh_2d = NamedSharding(mesh, P(axis_name, None))
        sh_1d = NamedSharding(mesh, P(axis_name))
    else:
        dev = jax.devices()[0]
        sh_2d = sh_1d = jax.sharding.SingleDeviceSharding(dev)
    template = {
        "features": jax.ShapeDtypeStruct((rows, f), jnp.float32,
                                         sharding=sh_2d),
        "norms": jax.ShapeDtypeStruct((rows,), jnp.float32, sharding=sh_1d),
        "genre_ids": jax.ShapeDtypeStruct((rows,), jnp.int32,
                                          sharding=sh_1d),
    }
    ckptr = ocp.StandardCheckpointer()
    tree = ckptr.restore(os.path.join(path, "arrays"), template)
    log.info(
        "sharded catalog loaded: %s (%d items, %s)",
        path, meta["num_items"],
        f"sharded {axis_name}x{mesh.shape[axis_name]}" if mesh is not None
        else "single-device",
    )
    return ShardedCatalogArtifact(
        tree["features"], tree["norms"], tree["genre_ids"], meta, path
    )
