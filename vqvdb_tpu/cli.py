"""Command-line interface: train / encode / decode / info / bench / export.

Covers the reference's two entry surfaces — the argparse train CLI
(ref: python/training.py:261-279) and the Houdini SOP encode/decode nodes
(ref: src/SOP/) — as subcommands over the same parameters (`vdbname` ->
--grid, `outputpath`/`inputfile` -> positional paths, `batchsize` ->
--batch-size).

Usage:
    python -m vqvdb_tpu.cli train --data-dir data/ --model-path out/m.vqmodel
    python -m vqvdb_tpu.cli encode leaves.npy scene.vqvdb --model m.vqmodel
    python -m vqvdb_tpu.cli decode scene.vqvdb out_dir/ --model m.vqmodel
    python -m vqvdb_tpu.cli info scene.vqvdb
    python -m vqvdb_tpu.cli bench --model m.vqmodel
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from pathlib import Path

import numpy as np

from vqvdb_tpu.utils.errors import VqvdbError


def _cmd_train(args) -> int:
    import jax

    from vqvdb_tpu.core.artifact import save_model
    from vqvdb_tpu.core.config import ModelConfig
    from vqvdb_tpu.train.data import LeafDataset, find_npy_files
    from vqvdb_tpu.train.train import TrainConfig, train

    files = find_npy_files(args.data_dir)
    if not files:
        print(f"error: no .npy files in {args.data_dir}", file=sys.stderr)
        return 2
    print(f"found {len(files)} .npy files")
    ds = LeafDataset(files, in_channels=args.in_channels, stride=args.stride)
    print(f"dataset: {len(ds)} leaves")

    mcfg = ModelConfig(
        in_channels=args.in_channels,
        embedding_dim=args.embedding_dim,
        num_embeddings=args.num_embeddings,
        num_quantizers=args.num_quantizers,
        encoder_arch=args.encoder_arch,
    )
    tcfg = TrainConfig(
        epochs=args.epochs,
        batch_size=args.batch_size,
        lr=args.lr,
        compute_dtype=args.compute_dtype,
        pool_dtype=args.pool_dtype,
        pool_segments=args.pool_segments,
        val_fraction=args.val_fraction,
        seed=args.seed,
    )
    if args.device_resident:
        # Whole dataset in HBM, epochs inside one compiled program — the
        # fast path for datasets that fit device memory.
        from vqvdb_tpu.train.fast import train_on_device

        mesh = None
        if args.data_parallel:
            from vqvdb_tpu.parallel.mesh import make_mesh
            mesh = make_mesh()
            print(f"data-parallel device-resident over "
                  f"{mesh.devices.size} devices")
        leaves = ds.gather(np.arange(len(ds)))
        ckpt_dir = args.checkpoint_dir or str(Path(args.model_path).parent / "ckpts")
        state, trace = train_on_device(leaves, mcfg, tcfg,
                                       checkpoint_dir=ckpt_dir,
                                       resume=not args.no_resume,
                                       mesh=mesh)
        history = {"loss": trace[:, 0].tolist(), "recon": trace[:, 1].tolist(),
                   "vq": trace[:, 2].tolist(), "perplexity": trace[:, 3].tolist(),
                   "val_loss": trace[:, 4].tolist()}
    else:
        mesh = None
        if args.data_parallel:
            from vqvdb_tpu.parallel.mesh import make_mesh
            mesh = make_mesh()
            print(f"data-parallel over {mesh.devices.size} devices")

        ckpt_dir = args.checkpoint_dir or str(Path(args.model_path).parent / "ckpts")
        state, history = train(ds, mcfg, tcfg, checkpoint_dir=ckpt_dir,
                               resume=not args.no_resume, mesh=mesh)
    Path(args.model_path).parent.mkdir(parents=True, exist_ok=True)
    # Model selection: export the best-val state when one was recorded
    # (ref selects on best validation loss, python/training.py:216-233);
    # the final state is exported only for runs without a usable val split.
    export_params = state.params
    from vqvdb_tpu.train.checkpoint import CheckpointManager

    best = CheckpointManager(ckpt_dir).restore_best(state)
    if best is not None:
        bstep, bstate = best
        meta = CheckpointManager(ckpt_dir).read_best_metrics() or {}
        print(f"exporting best-val checkpoint: step {bstep} "
              f"val={meta.get('val_loss', float('nan')):.6f}")
        export_params = bstate.params
    save_model(args.model_path, export_params, mcfg)
    print(f"model saved to {args.model_path}")
    hist_path = Path(args.model_path).with_suffix(".history.json")
    hist_path.write_text(json.dumps(history))
    return 0


def _load_one_grid(f: Path):
    """Load an npy file as a LeafGrid: leaf arrays ([N,8,8,8] or
    [N,8,8,8,C]) use the dataset convention; anything else is treated as a
    dense volume ([X,Y,Z] or [X,Y,Z,C]) and sparsified."""
    from vqvdb_tpu.vdb.grid import LeafGrid

    arr = np.load(f, mmap_mode="r")
    is_leaf_array = arr.ndim >= 4 and arr.shape[1:4] == (8, 8, 8)
    if is_leaf_array:
        return LeafGrid.load_npy(f)
    return LeafGrid.from_dense(f.stem, np.asarray(arr))


def _load_grids(path: Path, grid_name):
    if path.is_dir():
        grids = [_load_one_grid(f) for f in sorted(path.glob("*.npy"))
                 if not f.name.endswith("_origins.npy")]
        for f in sorted(path.glob("*.vdb")):
            grids.extend(_load_vdb(f))
    elif path.suffix == ".vdb":
        grids = _load_vdb(path)
    else:
        grids = [_load_one_grid(path)]
    if grid_name:
        grids = [g for g in grids if g.name == grid_name]
    return grids


def _load_vdb(path: Path):
    """Real OpenVDB asset ingestion (the reference's loadGrid-over-geometry
    path, ref: src/Utils/Utils.hpp:361-403 feeding VQVAECodec.cpp:36-59)."""
    from vqvdb_tpu.vdb.openvdb_io import read_vdb_leafgrids

    grids = read_vdb_leafgrids(path)
    for g in grids:
        dropped = getattr(g, "dropped_tiles", 0)
        if dropped:
            print(f"warning: grid '{g.name}': {dropped} active constant "
                  "tile(s) larger than a leaf were dropped (the VQ codec "
                  "compresses 8^3 leaves only)", file=sys.stderr)
    return grids


class _GracefulInterrupt:
    """SIGINT -> graceful encode abort (the reference's cook-interrupter
    UX, ref: src/Utils/Utils.hpp:174-209): the first ^C asks the codec to
    stop between batches — everything encoded so far is kept and the
    archive header is finalized valid (VqvdbWriter.abort_grid). A second
    ^C raises KeyboardInterrupt immediately."""

    def __enter__(self):
        import signal

        self.stopped = False

        def handler(signum, frame):
            if self.stopped:
                raise KeyboardInterrupt
            self.stopped = True
            print("interrupt: finishing current batch and finalizing the "
                  "archive (^C again to kill)", file=sys.stderr)

        self._prev = signal.signal(signal.SIGINT, handler)
        return self

    def __exit__(self, *exc):
        import signal

        # signal.getsignal/signal.signal report None for handlers installed
        # from C; None is not restorable (signal.signal rejects it) — leave
        # the default in place rather than crash after a successful encode.
        if self._prev is None:
            signal.signal(signal.SIGINT, signal.SIG_DFL)
        else:
            signal.signal(signal.SIGINT, self._prev)

    def __call__(self) -> bool:
        return self.stopped


def _cmd_encode(args) -> int:
    from vqvdb_tpu import api

    codec = api.make_codec(args.model, batch_size=args.batch_size,
                           compute_dtype=args.compute_dtype,
                           data_parallel=args.data_parallel)
    if args.streaming:
        if Path(args.input).suffix != ".vdb":
            print("error: --streaming requires a .vdb input", file=sys.stderr)
            return 2
        from vqvdb_tpu.vdb.openvdb_io import open_vdb_leaf_streams

        streams = open_vdb_leaf_streams(args.input, names=args.grid or None)
        if not streams:
            print("error: no grids matched", file=sys.stderr)
            return 2
        for s in streams:
            if s.dropped_tiles:
                print(f"warning: grid '{s.name}': {s.dropped_tiles} active "
                      "constant tile(s) larger than a leaf were dropped",
                      file=sys.stderr)
        with _GracefulInterrupt() as stop:
            stats = codec.compress_stream(
                streams, args.output, progress=args.verbose,
                format_version=args.format_version,
                compression=args.v5_codec,
                residual=args.residual, residual_tol=args.residual_tol,
                should_stop=stop)
        print(json.dumps({"grids": len(streams),
                          **{k: round(v, 2) if isinstance(v, float) else v
                             for k, v in stats.items()}}))
        return 130 if stats["aborted"] else 0
    grids = _load_grids(Path(args.input), args.grid)
    if not grids:
        print("error: no grids matched", file=sys.stderr)
        return 2
    with _GracefulInterrupt() as stop:
        stats = api.encode(grids, codec, args.output, progress=args.verbose,
                           format_version=args.format_version,
                           compression=args.v5_codec,
                           residual=args.residual,
                           residual_tol=args.residual_tol,
                           should_stop=stop)
    print(json.dumps({"grids": len(grids), **{k: round(v, 2) if isinstance(v, float)
                                              else v for k, v in stats.items()}}))
    return 130 if stats["aborted"] else 0


def _cmd_decode(args) -> int:
    from vqvdb_tpu import api

    codec = api.make_codec(args.model, batch_size=args.batch_size,
                           compute_dtype=args.compute_dtype,
                           data_parallel=args.data_parallel)
    bbox = None
    if args.bbox:
        v = [int(x) for x in args.bbox.split(",")]
        if len(v) != 6:
            print("error: --bbox wants x0,y0,z0,x1,y1,z1", file=sys.stderr)
            return 2
        bbox = (v[:3], v[3:])
    grids, stats = api.decode(args.input, codec, progress=args.verbose,
                              grids=args.grid or None, bbox=bbox)
    out_path = Path(args.output)
    if args.vdb or out_path.suffix == ".vdb":
        # Write all decoded grids into one OpenVDB asset (the reference's
        # GU_PrimVDB::buildFromGrid step, ref: SOP_VQVDB_Decoder.cpp:109-114).
        from vqvdb_tpu.vdb.openvdb_io import write_vdb_leafgrids

        out_path.parent.mkdir(parents=True, exist_ok=True)
        write_vdb_leafgrids(out_path, grids)
        print(json.dumps({"grids": [g.name for g in grids],
                          "vdb": str(out_path),
                          **{k: round(v, 2) if isinstance(v, float) else v
                             for k, v in stats.items()}}))
        return 0
    out_dir = out_path
    out_dir.mkdir(parents=True, exist_ok=True)
    for g in grids:
        if args.dense:
            dense, lo = g.to_dense()
            np.save(out_dir / f"{g.name}.dense.npy",
                    dense[..., 0] if dense.shape[-1] == 1 else dense)
            (out_dir / f"{g.name}.origin.json").write_text(
                json.dumps({"min_corner": lo.tolist()}))
        else:
            g.save_npy(out_dir / f"{g.name}.npy")
    print(json.dumps({"grids": [g.name for g in grids],
                      **{k: round(v, 2) if isinstance(v, float) else v
                         for k, v in stats.items()}}))
    return 0


def _cmd_encode_seq(args) -> int:
    """Encode an animated sequence: one .vqvdb per input frame file, the
    compiled codec reused across frames (api.encode_sequence — the
    reference's per-frame Houdini cook loop, amortized)."""
    from vqvdb_tpu import api

    files = sorted(Path(args.input_dir).glob(args.glob))
    if not files:
        print(f"error: no files match {args.glob} in {args.input_dir}",
              file=sys.stderr)
        return 2
    frames = []
    for f in files:
        grids = _load_grids(f, args.grid)
        if not grids:
            print(f"error: no grids matched in {f}", file=sys.stderr)
            return 2
        frames.append(grids)
    codec = api.make_codec(args.model, batch_size=args.batch_size,
                           compute_dtype=args.compute_dtype,
                           data_parallel=args.data_parallel)
    stats = api.encode_sequence(frames, codec, args.output_dir,
                                pattern=args.pattern,
                                format_version=args.format_version,
                                compression=args.v5_codec,
                                residual=args.residual)
    stats["inputs"] = [f.name for f in files]
    print(json.dumps({k: round(v, 4) if isinstance(v, float) else v
                      for k, v in stats.items()}))
    return 0


def _cmd_decode_seq(args) -> int:
    """Decode a directory of per-frame .vqvdb files into per-frame .vdb
    assets or npy leaf dirs."""
    from vqvdb_tpu import api

    codec = api.make_codec(args.model, batch_size=args.batch_size,
                           compute_dtype=args.compute_dtype,
                           data_parallel=args.data_parallel)
    frames, stats = api.decode_sequence(args.input_dir, codec,
                                        pattern=args.pattern)
    if not frames:
        print(f"error: no files match {args.pattern} in {args.input_dir}",
              file=sys.stderr)
        return 2
    out_dir = Path(args.output_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    for i, grids in enumerate(frames):
        if args.vdb:
            from vqvdb_tpu.vdb.openvdb_io import write_vdb_leafgrids

            write_vdb_leafgrids(out_dir / f"frame_{i:04d}.vdb", grids)
        else:
            frame_dir = out_dir / f"frame_{i:04d}"
            frame_dir.mkdir(exist_ok=True)
            for g in grids:
                g.save_npy(frame_dir / f"{g.name}.npy")
    print(json.dumps({k: round(v, 4) if isinstance(v, float) else v
                      for k, v in stats.items()}))
    return 0


def _cmd_vdbinfo(args) -> int:
    """Inspect an OpenVDB .vdb file without decoding its trees."""
    from vqvdb_tpu.vdb.openvdb_io import read_vdb_info

    print(json.dumps(read_vdb_info(args.input), indent=2))
    return 0


def _cmd_transcode(args) -> int:
    from vqvdb_tpu.format.transcode import transcode

    stats = transcode(args.input, args.output,
                      version=args.format_version,
                      compression=args.v5_codec,
                      drop_residual=args.drop_residual,
                      grids=args.grid or None)
    print(json.dumps(stats))
    return 0


def _cmd_info(args) -> int:
    from vqvdb_tpu.format.vqvdb import VqvdbReader

    with VqvdbReader(args.input) as r:
        out = {
            "version": r.version,
            "num_grids": r.num_grids,
            "num_embeddings": r.num_embeddings,
            "latent_dim_count": r.latent_dim_count,
            "grids": [],
        }
        while r.has_next_grid():
            meta = r.next_grid_metadata()
            entry = {
                "name": meta.name,
                "latent_shape": list(meta.latent_shape),
                "total_blocks": meta.total_blocks,
                "chunk_bytes": meta.chunk_size,
            }
            if meta.residual_mode:
                from vqvdb_tpu.format.vqvdb import RESIDUAL_MODE_NAMES

                entry["residual"] = RESIDUAL_MODE_NAMES[meta.residual_mode]
                entry["residual_channels"] = meta.residual_channels
            payload = r.skip_grid_payload()
            # Actual on-disk payload size (equals total_blocks*chunk_bytes
            # for v3/v4; the compressed frame bytes for v5/v6).
            entry["payload_bytes"] = payload
            if r.grid_codec is not None:
                entry["payload_codec"] = r.grid_codec
                if payload:
                    entry["frame_compression"] = round(
                        meta.total_blocks * meta.chunk_size / payload, 3)
            out["grids"].append(entry)
    print(json.dumps(out, indent=2))
    return 0


def _cmd_verify(args) -> int:
    """Verify a .vqvdb archive: structural integrity, and (with --against)
    round-trip fidelity vs the original source, including the v6 residual
    tier's stored error bound (format/verify.py)."""
    from vqvdb_tpu.format.verify import verify_container, verify_roundtrip

    in_path = Path(args.input)
    if in_path.is_dir():
        # Sequence form: audit every frame (encode-seq output directory).
        if args.against is not None:
            print("error: --against takes a single archive, not a "
                  "directory", file=sys.stderr)
            return 2
        frames = sorted(in_path.glob("*.vqvdb"))
        if not frames:
            print("error: no .vqvdb files in directory", file=sys.stderr)
            return 2
        reports = [verify_container(f) for f in frames]
        out = {"ok": all(r["ok"] for r in reports), "files": reports}
    elif args.against is None:
        out = verify_container(args.input)
    else:
        if args.model is None:
            print("error: --against requires --model", file=sys.stderr)
            return 2
        from vqvdb_tpu import api

        sources = _load_grids(Path(args.against), args.grid)
        if not sources:
            print("error: no source grids matched", file=sys.stderr)
            return 2
        codec = api.make_codec(args.model, batch_size=args.batch_size,
                               compute_dtype=args.compute_dtype)
        out = verify_roundtrip(args.input, codec, sources)
    print(json.dumps(out, indent=2))
    return 0 if out["ok"] else 1


def _cmd_bench(args) -> int:
    import bench  # repo-root harness
    bench.main()
    return 0


def _cmd_eval(args) -> int:
    """Quality evaluation over a leaf dataset (the reference's notebook
    acceptance harness as a command, ref: notebook_scalar.ipynb)."""
    from vqvdb_tpu import api
    from vqvdb_tpu.eval.metrics import codebook_report, evaluate_codec
    from vqvdb_tpu.train.data import LeafDataset, find_npy_files

    files = find_npy_files(args.data_dir)
    if not files:
        print(f"error: no .npy files in {args.data_dir}", file=sys.stderr)
        return 2
    ds = LeafDataset(files, in_channels=args.in_channels, stride=args.stride)
    leaves = ds.gather(np.arange(min(len(ds), args.max_leaves)))
    codec = api.make_codec(args.model, batch_size=args.batch_size,
                           compute_dtype=args.compute_dtype)
    report = evaluate_codec(codec, leaves)
    cb = codebook_report(report["indices"],
                         codec.mcfg.num_embeddings)
    if args.report_dir:
        from vqvdb_tpu.eval.report import write_report
        from vqvdb_tpu.models.vqvae import encoder_apply

        # 512 leaves feed the error heatmap / zero-split / ICA diagnostics
        # (ref notebook cells 5-9); the montage takes the first 6.
        k = min(512, leaves.shape[0])
        sample = leaves[:k] if leaves.ndim == 5 else leaves[:k, ..., None]
        recon = codec.decode_indices(report["indices"][:k])
        z = encoder_apply(codec.params.encoder,
                          sample.astype(np.float32), codec.mcfg)
        report["latent_sample"] = np.asarray(z).reshape(
            -1, codec.mcfg.embedding_dim)
        cb["embedding"] = np.asarray(codec.params.vq.embedding).reshape(
            -1, codec.mcfg.embedding_dim)
        if codec.mcfg.num_quantizers > 1:
            # Residual-VQ: the PCA scatter has one point per (stage, code)
            # but codebook_report pools stages into K counts — recolor
            # per stage from the stage-last index axis.
            idx = np.asarray(report["indices"]).reshape(
                -1, codec.mcfg.num_quantizers)
            cb["pca_counts"] = np.concatenate([
                np.bincount(idx[:, s],
                            minlength=codec.mcfg.num_embeddings)
                for s in range(codec.mcfg.num_quantizers)
            ]).astype(np.float64)
        md = write_report(args.report_dir, report, cb,
                          sample_leaves=sample, sample_recon=recon,
                          title=f"eval: {args.model}")
        print(f"report written to {md}", file=sys.stderr)
    out = {k: v for k, v in report.items()
           if not isinstance(v, np.ndarray)}
    out.update({k: v for k, v in cb.items() if not isinstance(v, np.ndarray)})
    print(json.dumps(out, indent=2))
    return 0


def _cmd_serve(args) -> int:
    """Run the codec as an HTTP service (see vqvdb_tpu/serving.py)."""
    from vqvdb_tpu import api
    from vqvdb_tpu.serving import serve

    codec = api.make_codec(args.model, batch_size=args.batch_size,
                           compute_dtype=args.compute_dtype)
    serve(codec, host=args.host, port=args.port)
    return 0


def _cmd_import_torch(args) -> int:
    """Convert a reference torch checkpoint (.pth) to a .vqmodel artifact."""
    from vqvdb_tpu.core.artifact import save_model
    from vqvdb_tpu.core.config import ModelConfig
    from vqvdb_tpu.core.torch_import import import_torch_checkpoint

    cfg = ModelConfig(
        in_channels=args.in_channels,
        embedding_dim=args.embedding_dim,
        num_embeddings=args.num_embeddings,
    )
    params = import_torch_checkpoint(args.checkpoint, cfg)
    Path(args.output).parent.mkdir(parents=True, exist_ok=True)
    save_model(args.output, params, cfg)
    print(json.dumps({"imported": str(args.checkpoint), "model": str(args.output)}))
    return 0


def _cmd_export_checkpoint(args) -> int:
    """Export a training checkpoint to a .vqmodel inference artifact
    (the reference's checkpoint -> deployable-model step, without the
    TorchScript/ONNX/C-array chain)."""
    import jax

    from vqvdb_tpu.core.artifact import save_model
    from vqvdb_tpu.core.config import ModelConfig
    from vqvdb_tpu.train.checkpoint import CheckpointManager
    from vqvdb_tpu.train.train import TrainConfig, make_train_state

    mcfg = ModelConfig(
        in_channels=args.in_channels,
        embedding_dim=args.embedding_dim,
        num_embeddings=args.num_embeddings,
        num_quantizers=args.num_quantizers,
        encoder_arch=args.encoder_arch,
    )
    template = make_train_state(jax.random.key(0), mcfg, TrainConfig(), 1)
    manager = CheckpointManager(args.checkpoint_dir)
    if args.best:
        restored = manager.restore_best(template)
        if restored is None:
            print(f"error: no best/ checkpoint in {args.checkpoint_dir}",
                  file=sys.stderr)
            return 2
        step, state = restored
    else:
        step = args.step if args.step is not None else manager.latest_step()
        if step is None:
            print(f"error: no checkpoints in {args.checkpoint_dir}", file=sys.stderr)
            return 2
        state = manager.restore(step, template)
    Path(args.output).parent.mkdir(parents=True, exist_ok=True)
    save_model(args.output, state.params, mcfg)
    print(json.dumps({"checkpoint_step": int(step), "best": bool(args.best),
                      "model": str(args.output)}))
    return 0


def _cmd_export_torch(args) -> int:
    """Export a .vqmodel to reference-runtime torch artifacts: a state_dict
    checkpoint (.pth, reference trainer layout) and/or a TorchScript module
    (.pt with encode/decode — the input of the reference's to_onnx.py)."""
    from vqvdb_tpu.core.artifact import load_model
    from vqvdb_tpu.interop import save_reference_checkpoint, save_torchscript

    params, cfg = load_model(args.model)
    out = {}
    if args.checkpoint:
        Path(args.checkpoint).parent.mkdir(parents=True, exist_ok=True)
        save_reference_checkpoint(args.checkpoint, params, cfg)
        out["checkpoint"] = str(args.checkpoint)
    if args.torchscript:
        Path(args.torchscript).parent.mkdir(parents=True, exist_ok=True)
        save_torchscript(args.torchscript, params, cfg)
        out["torchscript"] = str(args.torchscript)
    if not out:
        print("error: pass --checkpoint and/or --torchscript", file=sys.stderr)
        return 2
    print(json.dumps(out))
    return 0


def _cmd_export_onnx(args) -> int:
    """Emit encoder.onnx/decoder.onnx from a .vqmodel and (by default)
    validate them against the JAX forward at atol 1e-5 — the reference's
    own deployment gate (ref: python/to_onnx.py:185-219)."""
    import numpy as np

    from vqvdb_tpu.core.artifact import load_model
    from vqvdb_tpu.interop import export_onnx

    params, cfg = load_model(args.model)
    paths = export_onnx(args.output_dir, params, cfg)
    result = dict(paths)
    if args.embed_header:
        from vqvdb_tpu.interop.embed import write_embed_header

        hdr = write_embed_header(args.embed_header, {
            "encoder_model_data": paths["encoder"],
            "decoder_model_data": paths["decoder"],
        })
        result["embed_header"] = str(hdr)
    if not args.no_validate:
        import jax.numpy as jnp

        from vqvdb_tpu.interop.onnx_eval import run_model
        from vqvdb_tpu.models.vqvae import decode_from_indices, encode_to_indices

        rng = np.random.default_rng(0)
        x = rng.random((4, 8, 8, 8, cfg.in_channels), np.float32)
        want_idx = np.asarray(encode_to_indices(params, jnp.asarray(x), cfg))
        got_idx = run_model(paths["encoder"],
                            {"input": np.moveaxis(x, -1, 1)})["output"]
        idx_match = float(np.mean(want_idx == got_idx))
        want = np.asarray(decode_from_indices(params, jnp.asarray(want_idx), cfg))
        got = run_model(paths["decoder"], {"input": want_idx})["output"]
        dec_err = float(np.abs(np.moveaxis(got, 1, -1) - want).max())
        result.update({"encoder_index_agreement": idx_match,
                       "decoder_max_abs_err": dec_err,
                       "valid": bool(idx_match == 1.0 and dec_err < 1e-5)})
        if not result["valid"]:
            print(json.dumps(result))
            return 3
    print(json.dumps(result))
    return 0


def _cmd_extract(args) -> int:
    """Extract leaves from .vdb assets into the .npy training layout
    (the reference workflow's 'extract leaves to .npy' step, ref:
    README.md:49 — there done with external tooling; here built in).
    Scalar and Vec3f grids are written to separate files; origins sidecars
    are kept so extracted sets can also be re-encoded losslessly."""
    from vqvdb_tpu.vdb.openvdb_io import read_vdb_leafgrids

    out_dir = Path(args.out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    inputs = []
    for item in args.inputs:
        p = Path(item)
        if p.is_dir():
            inputs.extend(sorted(p.glob("*.vdb")))
        else:
            inputs.append(p)
    if not inputs:
        print("error: no .vdb inputs", file=sys.stderr)
        return 2
    written = []
    total = 0
    used = set()
    for p in inputs:
        for g in read_vdb_leafgrids(p):
            if args.grid and g.name != args.grid:
                continue
            # Duplicate grid names within a file are legal in OpenVDB;
            # never silently overwrite an earlier extraction.
            stem, k = f"{p.stem}_{g.name}", 2
            while stem in used:
                stem = f"{p.stem}_{g.name}_{k}"
                k += 1
            used.add(stem)
            out = out_dir / f"{stem}.npy"
            g.save_npy(out)
            written.append(str(out))
            total += int(g.leaves.shape[0])
    print(json.dumps({"files": len(written), "leaves": total,
                      "dir": str(out_dir)}))
    return 0 if written else 2


def _cmd_datagen(args) -> int:
    """Generate procedural training data (npy leaf files)."""
    from vqvdb_tpu.train.synthetic import make_leaf_dataset_files

    paths = make_leaf_dataset_files(
        args.out_dir, n_volumes=args.volumes, size=args.size,
        seed=args.seed, channels=args.channels, family=args.family)
    total = sum(int(np.load(p, mmap_mode="r").shape[0]) for p in paths)
    print(json.dumps({"files": len(paths), "leaves": total,
                      "dir": str(args.out_dir)}))
    return 0


def main(argv=None) -> int:
    # Platform override (e.g. VQVDB_PLATFORM=cpu). Needed because some
    # environments preload a TPU PJRT plugin at interpreter start, consuming
    # JAX_PLATFORMS before user code runs; the config API still wins as long
    # as no backend has been initialized yet.
    platform = os.environ.get("VQVDB_PLATFORM")
    if platform:
        import jax
        jax.config.update("jax_platforms", platform)

    # Persistent XLA compile cache: repeat invocations skip the (remote)
    # compile entirely. VQVDB_COMPILE_CACHE=off to disable.
    from vqvdb_tpu.utils.compile_cache import enable_persistent_cache
    enable_persistent_cache()

    p = argparse.ArgumentParser(prog="vqvdb_tpu",
                                description="TPU-native VQ-VAE volume codec")
    sub = p.add_subparsers(dest="command", required=True)

    pt = sub.add_parser("train", help="Train the VQ-VAE model.")
    pt.add_argument("--data-dir", required=True, help="Directory with .npy leaf files")
    pt.add_argument("--model-path", default="models/vqvae.vqmodel")
    pt.add_argument("--checkpoint-dir", default=None)
    pt.add_argument("--epochs", type=int, default=30)
    pt.add_argument("--batch-size", type=int, default=2048)
    pt.add_argument("--lr", type=float, default=1e-4)
    pt.add_argument("--num-embeddings", type=int, default=256)
    pt.add_argument("--num-quantizers", type=int, default=1,
                    help="residual-VQ stages: 1 = reference architecture; "
                         "2+ = S bytes/latent-position quality tier "
                         "(effective codebook K^S). S=2 is the RECOMMENDED "
                         "quality tier when consumers run this framework: "
                         "+3-4 dB on every family at ~8%% decode cost and "
                         "1.84x container bytes (docs/MIGRATION.md "
                         "'Choosing a quality tier'); keep S=1 only for "
                         "reference-runtime byte compatibility")
    pt.add_argument("--embedding-dim", type=int, default=128)
    pt.add_argument("--encoder-arch", default="reference",
                    choices=["reference", "packed", "packed_lite",
                             "packed_stem"],
                    help="encoder graph family: 'reference' reproduces the "
                         "reference encoder (torch/ONNX interop); 'packed' "
                         "/ 'packed_lite' are the TPU-co-designed graphs "
                         "(1.5-6.4x encode throughput; best-in-class for "
                         "vec3, near-parity for scalar smoke, ~1.4 dB "
                         "behind on level sets at large training scale — "
                         "benchmarks/arch10x_*_r4.json); 'packed_stem' adds "
                         "a cheap 8^3 stem to 'packed' to recover the "
                         "level-set tail at the same speed class")
    pt.add_argument("--in-channels", type=int, default=1, choices=[1, 3])
    pt.add_argument("--stride", type=int, default=1, help="dataset subsample stride")
    pt.add_argument("--compute-dtype", default="bfloat16")
    pt.add_argument("--pool-dtype", default="float32",
                    choices=["float32", "bfloat16"],
                    help="dtype of the device-RESIDENT dataset "
                         "(--device-resident only): bfloat16 halves its "
                         "HBM footprint but bf16-rounds the recon target "
                         "— safe when the model's error floor is well "
                         "above bf16 rounding (e.g. vec3)")
    pt.add_argument("--pool-segments", type=int, default=1,
                    help="epoch-sharded resident pool (--device-resident "
                         "only): each compiled span runs over 1/S of the "
                         "pool, rotating per span — the workaround for "
                         "the v5e worker crash on 8^3-stage graphs at "
                         ">=4 GB pools (TrainConfig.pool_segments)")
    pt.add_argument("--val-fraction", type=float, default=0.2,
                    help="held-out fraction for per-epoch validation and "
                         "best-val selection (0 disables the split; on "
                         "procedurally unlimited data a small holdout "
                         "keeps selection without starving training)")
    pt.add_argument("--seed", type=int, default=0)
    pt.add_argument("--data-parallel", action="store_true",
                    help="shard batches over all local devices")
    pt.add_argument("--device-resident", action="store_true",
                    help="keep the whole dataset in device memory and run "
                         "epochs inside one compiled program (fastest when "
                         "the dataset fits HBM)")
    pt.add_argument("--no-resume", action="store_true")
    pt.set_defaults(func=_cmd_train)

    pe = sub.add_parser("encode", help="Compress grids to a .vqvdb file.")
    pe.add_argument("input", help=".vdb / .npy leaf file, or directory of them")
    pe.add_argument("output", help="output .vqvdb path")
    pe.add_argument("--model", required=True, help=".vqmodel artifact")
    pe.add_argument("--grid", default=None, help="grid name filter (SOP vdbname)")
    pe.add_argument("--batch-size", type=int, default=4096)
    pe.add_argument("--compute-dtype", default="bfloat16")
    pe.add_argument("--data-parallel", action="store_true",
                    help="shard each device step over all local devices")
    pe.add_argument("--streaming", action="store_true",
                    help="stream leaves from a .vdb input at O(batch) host "
                         "memory (mmap + lazy buffer reads) — for scenes "
                         "larger than host RAM; output is byte-identical "
                         "to the default path")
    pe.add_argument("--format-version", type=int, default=None,
                    choices=[3, 4, 5, 6],
                    help="container version: default auto (3, or 4 for "
                         "K>256; 6 with --residual); 5 adds payload "
                         "compression (~1.5x smaller, not readable by the "
                         "reference runtime)")
    pe.add_argument("--v5-codec", default="zlib",
                    choices=["zlib", "lzma", "lz4"],
                    help="v5/v6 payload codec (with --format-version 5/6): "
                         "zlib for the smallest files, lz4 for several-fold "
                         "faster reads")
    pe.add_argument("--residual", default=None, choices=["int8", "f16"],
                    help="near-lossless tier (v6): store per-leaf "
                         "reconstruction-error corrections next to the "
                         "indices; decode applies them automatically "
                         "(int8: ~84 dB at ~6x on the flagship; f16: "
                         "error = one half-precision rounding)")
    pe.add_argument("--residual-tol", type=float, default=None,
                    help="int8-mode target max abs error: error bound "
                         "becomes max(leaf_max_err/254, tol) and "
                         "already-good leaves quantize to compressible "
                         "zeros (smaller files)")
    pe.add_argument("-v", "--verbose", action="store_true")
    pe.set_defaults(func=_cmd_encode)

    pd = sub.add_parser("decode", help="Decompress a .vqvdb file.")
    pd.add_argument("input", help=".vqvdb path")
    pd.add_argument("output", help="output directory for .npy grids, or a "
                                   ".vdb path (implies --vdb)")
    pd.add_argument("--model", required=True)
    pd.add_argument("--batch-size", type=int, default=4096)
    pd.add_argument("--compute-dtype", default="bfloat16")
    pd.add_argument("--grid", action="append", default=[],
                    help="decode only this grid (repeatable); others are "
                         "skipped on disk without decoding")
    pd.add_argument("--bbox",
                    help="voxel-space selection x0,y0,z0,x1,y1,z1 (lower "
                         "inclusive, upper exclusive): only intersecting "
                         "leaves are decoded")
    pd.add_argument("--dense", action="store_true",
                    help="write dense volumes (scattered over each grid's "
                         "bbox) instead of leaf arrays")
    pd.add_argument("--vdb", action="store_true",
                    help="write one OpenVDB .vdb file containing all grids")
    pd.add_argument("--data-parallel", action="store_true",
                    help="shard each device step over all local devices")
    pd.add_argument("-v", "--verbose", action="store_true")
    pd.set_defaults(func=_cmd_decode)

    pi = sub.add_parser("info", help="Inspect a .vqvdb file.")
    pi.add_argument("input")
    pi.set_defaults(func=_cmd_info)

    pt = sub.add_parser("transcode",
                        help="Rewrite a .vqvdb container (version / "
                             "payload codec / tier / grid subset) without "
                             "a model.")
    pt.add_argument("input")
    pt.add_argument("output")
    pt.add_argument("--format-version", type=int, default=None,
                    choices=[3, 4, 5, 6],
                    help="target version (default: keep the source's)")
    pt.add_argument("--v5-codec", default="zlib",
                    choices=["zlib", "lzma", "lz4"],
                    help="target payload codec for v5/v6")
    pt.add_argument("--drop-residual", action="store_true",
                    help="confirm discarding a v6 residual stream (the "
                         "output decodes lossy)")
    pt.add_argument("--grid", action="append", default=[],
                    help="keep only this grid (repeatable)")
    pt.set_defaults(func=_cmd_transcode)

    pes = sub.add_parser("encode-seq",
                         help="Encode an animated sequence (one .vqvdb "
                              "per frame, compiled codec reused).")
    pes.add_argument("input_dir", help="directory of per-frame assets")
    pes.add_argument("output_dir")
    pes.add_argument("--model", required=True)
    pes.add_argument("--glob", default="*.vdb",
                     help="frame file pattern inside input_dir "
                          "(default *.vdb; also accepts *.npy)")
    pes.add_argument("--grid", default=None)
    pes.add_argument("--pattern", default="frame_{:04d}.vqvdb",
                     help="output filename template")
    pes.add_argument("--batch-size", type=int, default=4096)
    pes.add_argument("--compute-dtype", default="bfloat16")
    pes.add_argument("--data-parallel", action="store_true")
    pes.add_argument("--format-version", type=int, default=None,
                     choices=[3, 4, 5, 6])
    pes.add_argument("--v5-codec", default="zlib",
                     choices=["zlib", "lzma", "lz4"])
    pes.add_argument("--residual", default=None, choices=["int8", "f16"],
                     help="near-lossless tier per frame (v6)")
    pes.set_defaults(func=_cmd_encode_seq)

    pds = sub.add_parser("decode-seq",
                         help="Decode a directory of per-frame .vqvdb "
                              "files.")
    pds.add_argument("input_dir")
    pds.add_argument("output_dir")
    pds.add_argument("--model", required=True)
    pds.add_argument("--pattern", default="frame_*.vqvdb")
    pds.add_argument("--vdb", action="store_true",
                     help="write one .vdb per frame instead of npy dirs")
    pds.add_argument("--batch-size", type=int, default=4096)
    pds.add_argument("--compute-dtype", default="bfloat16")
    pds.add_argument("--data-parallel", action="store_true")
    pds.set_defaults(func=_cmd_decode_seq)

    pvi = sub.add_parser("vdbinfo",
                         help="Inspect an OpenVDB .vdb file (grids, "
                              "types, compression, bbox) without "
                              "decoding trees.")
    pvi.add_argument("input")
    pvi.set_defaults(func=_cmd_vdbinfo)

    pvf = sub.add_parser(
        "verify",
        help="Verify a .vqvdb archive: structural integrity, and with "
             "--against, round-trip fidelity vs the source (incl. the v6 "
             "residual error bound). Exit 1 on any failed check.")
    pvf.add_argument("input",
                     help=".vqvdb archive, or a directory of them (an "
                          "encode-seq sequence) for per-frame audits")
    pvf.add_argument("--against", default=None,
                     help="source to compare against (npy/.vdb file or "
                          "directory, the encode-input convention)")
    pvf.add_argument("--model", default=None,
                     help="model artifact (required with --against); use "
                          "the encode-time codec settings for exact v6 "
                          "bound checks")
    pvf.add_argument("--grid", default=None,
                     help="restrict the source to one grid name")
    pvf.add_argument("--batch-size", type=int, default=4096)
    pvf.add_argument("--compute-dtype", default="bfloat16")
    pvf.set_defaults(func=_cmd_verify)

    pb = sub.add_parser("bench", help="Run the decode-throughput benchmark.")
    pb.set_defaults(func=_cmd_bench)

    pv = sub.add_parser("eval", help="Quality evaluation over a leaf dataset.")
    pv.add_argument("--data-dir", required=True)
    pv.add_argument("--model", required=True)
    pv.add_argument("--in-channels", type=int, default=1, choices=[1, 3])
    pv.add_argument("--stride", type=int, default=1)
    pv.add_argument("--max-leaves", type=int, default=100_000)
    pv.add_argument("--batch-size", type=int, default=4096)
    pv.add_argument("--compute-dtype", default="bfloat16")
    pv.add_argument("--report-dir", default=None,
                    help="also write PNG plots + report.md (the reference "
                         "notebooks' acceptance plots) into this directory")
    pv.set_defaults(func=_cmd_eval)

    ps = sub.add_parser("serve", help="Serve the codec over HTTP.")
    ps.add_argument("--model", required=True)
    ps.add_argument("--host", default="127.0.0.1")
    ps.add_argument("--port", type=int, default=8990)
    ps.add_argument("--batch-size", type=int, default=4096)
    ps.add_argument("--compute-dtype", default="bfloat16")
    ps.set_defaults(func=_cmd_serve)

    pm = sub.add_parser("import-torch",
                        help="Convert a reference torch .pth checkpoint to .vqmodel.")
    pm.add_argument("checkpoint")
    pm.add_argument("output")
    pm.add_argument("--in-channels", type=int, default=1, choices=[1, 3])
    pm.add_argument("--embedding-dim", type=int, default=128)
    pm.add_argument("--num-embeddings", type=int, default=256)
    pm.set_defaults(func=_cmd_import_torch)

    px = sub.add_parser("export-checkpoint",
                        help="Export a training checkpoint to a .vqmodel artifact.")
    px.add_argument("checkpoint_dir")
    px.add_argument("output")
    px.add_argument("--step", type=int, default=None,
                    help="checkpoint step (default: latest)")
    px.add_argument("--best", action="store_true",
                    help="export the durable best-validation checkpoint")
    px.add_argument("--in-channels", type=int, default=1, choices=[1, 3])
    px.add_argument("--embedding-dim", type=int, default=128)
    px.add_argument("--num-embeddings", type=int, default=256)
    px.add_argument("--num-quantizers", type=int, default=1)
    px.add_argument("--encoder-arch", default="reference",
                    choices=["reference", "packed", "packed_lite",
                             "packed_stem"])
    px.set_defaults(func=_cmd_export_checkpoint)

    pxt = sub.add_parser(
        "export-torch",
        help="Export a .vqmodel to reference torch artifacts (.pth/.pt).")
    pxt.add_argument("model", help=".vqmodel artifact")
    pxt.add_argument("--checkpoint", help="output .pth (reference trainer layout)")
    pxt.add_argument("--torchscript",
                     help="output .pt TorchScript (to_onnx.py-compatible)")
    pxt.set_defaults(func=_cmd_export_torch)

    pxo = sub.add_parser(
        "export-onnx",
        help="Emit encoder.onnx/decoder.onnx for the reference ORT runtime.")
    pxo.add_argument("model", help=".vqmodel artifact")
    pxo.add_argument("output_dir", help="directory for encoder.onnx/decoder.onnx")
    pxo.add_argument("--no-validate", action="store_true",
                     help="skip the JAX-vs-ONNX parity check")
    pxo.add_argument("--embed-header", default=None,
                     help="also write a bin_onnx.h-style C header embedding "
                          "both models (reference convert_to_header.py step)")
    pxo.set_defaults(func=_cmd_export_onnx)

    pxv = sub.add_parser(
        "extract",
        help="Extract leaves from .vdb files into npy training data.")
    pxv.add_argument("inputs", nargs="+", help=".vdb files or directories")
    pxv.add_argument("out_dir")
    pxv.add_argument("--grid", default=None, help="grid name filter")
    pxv.set_defaults(func=_cmd_extract)

    pg = sub.add_parser("datagen", help="Generate procedural npy leaf data.")
    pg.add_argument("out_dir")
    pg.add_argument("--volumes", type=int, default=8)
    pg.add_argument("--size", type=int, default=64)
    pg.add_argument("--seed", type=int, default=0)
    pg.add_argument("--channels", type=int, default=1, choices=[1, 3])
    pg.add_argument("--family", default="smoke",
                    choices=["smoke", "levelset", "mixed"],
                    help="scalar volume family: fog densities, narrow-band "
                         "level sets, or alternating")
    pg.set_defaults(func=_cmd_datagen)

    args = p.parse_args(argv)
    try:
        return args.func(args)
    except BrokenPipeError:
        return 0  # e.g. `vqvdb info ... | head` closing stdout early
    except VqvdbError as e:
        # Typed domain errors (malformed container, model mismatch, bad
        # artifact/config) are user-facing diagnoses, not crashes.
        print(f"error: {e}", file=sys.stderr)
        return 1
    except OSError as e:
        print(f"error: {e}", file=sys.stderr)
        return 1


if __name__ == "__main__":
    sys.exit(main())
