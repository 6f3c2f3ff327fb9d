"""Multi-module production server.

Behavioral reference: `rust/moshi-server/src/main.rs` — a TOML config maps
routes to modules ({Lm, Asr, BatchedAsr, Mimi, Tts, ...}, main.rs:153-198,
293-302), each warmed up at startup (346-380); auth via the `kyutai-api-key`
header (main.rs:28); `/metrics` Prometheus (482-500), `/api/build_info`,
`/api/modules_info`.

Reference `moshi-server` TOML configs work VERBATIM: serde type tags
(`Lm`/`Asr`/`BatchedAsr`/`PyBatchedAsr`/`Mimi`/`Tts`/`Py`/`PyPost`),
`path` routes, explicit model files and the inline `[modules.X.model]`
architecture schema are translated by `serve/toml_compat.py`
(main.rs:154-277 schema).  The native snake_case schema below is the
moshi_tpu-first spelling of the same modules.

Config example (TOML):

    authorized_ids = ["public_token"]
    static_dir = "./client/dist"     # optional

    [modules.chat]
    type = "moshi"                    # moshi | batched_moshi | batched_asr | tts
    route = "/api/chat"
    checkpoint_dir = "/ckpt/moshiko"
    kv_cache = "int4"                 # optional: model | int8 | int4
                                      # (memory/capacity knob, BENCH_BATCH.md)
    context = 1000                    # optional (batched_asr | batched_tts):
                                      # bound the attention window (per-user
                                      # KV memory scales with it)
    weights = "int8"                  # optional (batched_asr | batched_tts):
                                      # re-quantize LM weights after load
    mimi_dtype = "bf16"               # optional (batched_moshi | batched_asr
                                      # | batched_tts): halves the codec
                                      # share at large batch
    tp = 2                            # optional (moshi | batched_moshi):
                                      # tensor-parallel over all chips
                                      # (7B bf16 needs 2x 16 GB)

    [modules.asr]
    type = "batched_asr"
    route = "/api/asr-streaming"
    checkpoint_dir = "/ckpt/stt"
    batch_size = 8

    [modules.custom]                  # user-extensible module: the analog of
    type = "py"                       # moshi-server's pyo3-embedded py_module
    route = "/api/custom"             # (py_module.rs:399-441) — the script's
    script = "plugins/my_module.py"   # init(batch_size, config) returns an
    batch_size = 8                    # app exposing `async handle(request)`
    [modules.custom.config]           # arbitrary table forwarded to init()
    greeting = "hi"

Usage: python -m moshi_tpu.serve.worker --config config.toml [--port 8998]
"""

import argparse
import asyncio
import tomllib
from pathlib import Path

import jax
import jax.numpy as jnp

from .metrics import REGISTRY


def _load_tokenizer(checkpoint_dir, info):
    try:
        tok_path = info.tokenizer_path
    except AssertionError:
        tok_path = Path(checkpoint_dir or ".") / info.tokenizer_name
    if Path(tok_path).exists():
        from ..text.spm import SentencePieceTokenizer
        return SentencePieceTokenizer(tok_path)
    return None


def _build_py_module(name: str, mcfg: dict):
    """User-extensible module, the Python-native analog of moshi-server's
    pyo3-embedded `py_module` / `py_module_post` (py_module.rs:399-441,
    main.rs:188-196 Py/PyPost).  The reference embeds Python in the Rust
    server to run a user script's batched step loop; this worker IS Python,
    so the script plugs in directly.

    The script must define `init(batch_size, config) -> app`, where `app`
    exposes:
      - `async handle(request)`         (type="py": mounted on GET, usually
                                         a websocket handler)
      - `async handle_post(request)`    (type="py_post": mounted on POST,
                                         like the reference's TTS POST API)
      - optionally `warmup()`           called once at build time
      - optionally `async run_loop()`   scheduled as a background task at
                                        startup (the reference's model loop,
                                        py_module.rs:265-283)
    """
    import importlib.util

    mtype = mcfg["type"]
    route = mcfg["route"]
    script = Path(mcfg["script"])
    spec = importlib.util.spec_from_file_location(
        f"moshi_tpu_py_module_{name}", script)
    if spec is None or spec.loader is None:
        raise ValueError(f"module {name}: cannot load script {script}")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    if not hasattr(mod, "init"):
        raise ValueError(f"module {name}: {script} defines no init()")
    app = mod.init(mcfg.get("batch_size", 1), dict(mcfg.get("config", {})))
    if hasattr(app, "warmup"):
        app.warmup()

    startup = None
    if hasattr(app, "run_loop"):
        async def startup():
            return asyncio.create_task(app.run_loop())

    handler_name = "handle_post" if mtype == "py_post" else "handle"
    if not hasattr(app, handler_name):
        raise ValueError(f"module {name}: init() result has no {handler_name}")
    handler = getattr(app, handler_name)
    return route, handler, startup, \
        {"type": mtype, "script": str(script),
         "batch_size": mcfg.get("batch_size", 1)}


def build_module(name: str, mcfg: dict, seed: int):
    """Returns (route, handler, startup_coro_factory | None, info_dict).

    Checkpoints resolve from a local `checkpoint_dir`, or from the hub via
    `hf_repo = "kyutai/..."` (rust worker TOML `hf://` resolution,
    main.rs:210-277); per-file `hf://repo/file` overrides are accepted in
    `moshi_weights` / `mimi_weights` / `tokenizer_file`."""
    from ..models.loaders import CheckpointInfo
    from .toml_compat import (is_reference_module, translate_module,
                              inline_checkpoint_info)

    if is_reference_module(mcfg):
        # verbatim rust moshi-server schema (type = "Lm"/"Asr"/... with the
        # model config inline) — translate to the native schema
        mcfg = translate_module(name, mcfg)
    mtype = mcfg["type"]
    route = mcfg["route"]
    if mtype in ("py", "py_post"):
        return _build_py_module(name, mcfg)
    if mtype == "py_batched_asr":
        from .py_basr import build_py_batched_asr
        return build_py_batched_asr(name, mcfg)
    ckpt = mcfg.get("checkpoint_dir")
    if "_inline" in mcfg:
        info = inline_checkpoint_info(mcfg["_inline"])
    elif ckpt is not None:
        info = CheckpointInfo.from_dir(ckpt)
    elif "hf_repo" in mcfg:
        info = CheckpointInfo.from_hf_repo(
            mcfg["hf_repo"],
            moshi_weights=mcfg.get("moshi_weights"),
            mimi_weights=mcfg.get("mimi_weights"),
            tokenizer=mcfg.get("tokenizer_file"),
            revision=mcfg.get("revision"))
    else:
        raise ValueError(f"module {name}: set checkpoint_dir or hf_repo")
    rng = jax.random.PRNGKey(seed)

    # TOML capacity knobs kv_cache/context/weights/mimi_dtype (BENCH_BATCH.md
    # / BENCH_TTS_ASR.md) — one shared implementation for every entry point
    from ..utils.serving import (apply_serving_overrides, override_lm,
                                 resolve_mimi_dtype)

    def maybe_override_kv(lm):
        return override_lm(lm, mcfg.get("kv_cache"), mcfg.get("context"))

    def mimi_dtype():
        return resolve_mimi_dtype(mcfg.get("mimi_dtype"))

    def _stage_load(mc):
        import contextlib
        if not mc.get("tp"):
            return contextlib.nullcontext()
        from ..parallel.mesh import host_staged_loading
        return host_staged_loading()

    def _maybe_mesh(mc, all_devices=True):
        # TOML `tp = N`: serve this module over a (dp, tp) mesh (LM weights
        # tensor-parallel).  Batched modules spread their batch over the
        # remaining chips (dp); single-session modules use exactly tp chips.
        if not mc.get("tp"):
            return None
        from ..parallel.mesh import make_mesh
        tp = int(mc["tp"])
        return make_mesh(tp=tp) if all_devices else make_mesh(tp, tp=tp)

    if mtype == "moshi":
        from .server import ServerState
        with _stage_load(mcfg):
            mimi, mimi_params = info.get_mimi()
            lm, lm_params = info.get_moshi()
        lm = maybe_override_kv(lm)
        gen_cfg = dict(info.lm_gen_config)
        ckpt_cfg_coef = gen_cfg.pop("cfg_coef", 1.0)
        state = ServerState(info, mimi, mimi_params, lm, lm_params,
                            _load_tokenizer(ckpt, info),
                            cfg_coef=mcfg.get("cfg_coef", ckpt_cfg_coef),
                            log_dir=mcfg.get("log_dir"),
                            mesh=_maybe_mesh(mcfg, all_devices=False),
                            # TOML: vault_url/fleet_auth/replicate_every —
                            # cross-worker session migration via the fleet
                            # dispatcher's SnapshotVault
                            vault_url=mcfg.get("vault_url"),
                            fleet_auth=mcfg.get("fleet_auth"),
                            replicate_every=mcfg.get("replicate_every", 125),
                            **gen_cfg)
        state.warmup()
        return route, state.handle_chat, None, {"type": mtype}

    if mtype == "batched_moshi":
        from .batched_moshi import BatchedMoshiState, handle_chat
        with _stage_load(mcfg):
            mimi, mimi_params = info.get_mimi()
            lm, lm_params = info.get_moshi()
        lm = maybe_override_kv(lm)
        state = BatchedMoshiState(mimi, mimi_params, lm, lm_params,
                                  _load_tokenizer(ckpt, info),
                                  mcfg.get("batch_size", 4), rng,
                                  mimi_dtype=mimi_dtype(),
                                  mesh=_maybe_mesh(mcfg),
                                  **info.lm_gen_config)
        state.warmup()

        async def startup():
            return asyncio.create_task(state.run_loop())

        return route, (lambda req: handle_chat(req, state)), startup, \
            {"type": mtype, "batch_size": state.batch_size}

    if mtype in ("batched_asr", "asr"):
        # "asr" = the reference's single-stream Asr module
        # (moshi-server/src/asr.rs:16-33): same msgpack wire protocol as
        # BatchedAsr, one exclusive session -> batch of 1.
        from ..models.asr import StreamingASR, asr_sum_condition
        from .batched_asr import BatchedAsrState, handle_asr_socket
        mimi, mimi_params = info.get_mimi()
        lm, lm_params = info.get_moshi()
        lm, lm_params, mimi_params, md = apply_serving_overrides(
            lm, lm_params, mimi_params, kv_cache=mcfg.get("kv_cache"),
            context=mcfg.get("context"), weights=mcfg.get("weights"),
            mimi_dtype=mcfg.get("mimi_dtype"))
        if "asr_delay_in_tokens" in mcfg:  # rust AsrConfig field (main.rs:95)
            delay = int(mcfg["asr_delay_in_tokens"])
        else:
            delay = int(info.stt_config.get("audio_delay_seconds", 0.5)
                        * mimi.frame_rate)
        # continuous `delay` conditioning (asr.rs:55-67): required (in either
        # form) when the checkpoint carries a `delay` conditioner
        cond = asr_sum_condition(
            info, lm.config.dim,
            conditioning_delay=mcfg.get(
                "conditioning_delay", info.stt_config.get("conditioning_delay")),
            learnt_padding=mcfg.get("conditioning_learnt_padding", False))
        batch_size = 1 if mtype == "asr" else mcfg.get("batch_size", 8)
        asr = StreamingASR(mimi, lm, batch_size,
                           asr_delay_in_tokens=delay,
                           temperature=mcfg.get("temperature", 0.0),
                           text_tokenizer=_load_tokenizer(ckpt, info),
                           mimi_dtype=md, sum_condition=cond,
                           mimi_chunks=mcfg.get("mimi_chunks", 1))
        state = BatchedAsrState(asr, mimi_params, lm_params, rng)

        async def startup():
            return asyncio.create_task(state.run_loop())

        return route, (lambda req: handle_asr_socket(req, state)), startup, \
            {"type": mtype, "batch_size": asr.batch_size}

    def _build_tts():
        from ..run_tts import build_tts_from_info, DEFAULT_DSM_TTS_VOICE_REPO
        kw = dict(temp=mcfg.get("temp", 0.6),
                  cfg_coef=mcfg.get("cfg_coef", 1.0),
                  n_q=mcfg.get("n_q", 32),
                  voice_repo=mcfg.get("voice_dir",
                                      DEFAULT_DSM_TTS_VOICE_REPO),
                  voice_aliases=mcfg.get("voices"))
        if "max_padding" in mcfg:
            kw["max_padding"] = int(mcfg["max_padding"])
        return build_tts_from_info(info, **kw)

    if mtype == "tts":
        from .tts_ws import TTSStreamer, handle_tts_socket
        tts, lm_params, mimi_params, cp_params = _build_tts()

        def make_streamer():
            return TTSStreamer(tts, lm_params, mimi_params, rng,
                               condition_params=cp_params)

        return route, (lambda req: handle_tts_socket(req, make_streamer)), \
            None, {"type": mtype}

    if mtype == "batched_tts":
        from .batched_tts import BatchedTTSState, handle_batched_tts_socket
        tts, lm_params, mimi_params, cp_params = _build_tts()
        tts.lm, lm_params, _, _ = apply_serving_overrides(
            tts.lm, lm_params, None, kv_cache=mcfg.get("kv_cache"),
            context=mcfg.get("context"), weights=mcfg.get("weights"))
        state = BatchedTTSState(tts, lm_params, mimi_params,
                                mcfg.get("batch_size", 8), rng,
                                condition_params=cp_params,
                                mimi_dtype=mimi_dtype())

        async def startup():
            return asyncio.create_task(state.run_loop())

        return route, (lambda req: handle_batched_tts_socket(req, state)), \
            startup, {"type": mtype, "batch_size": state.batch_size}

    if mtype == "mimi":
        from .mimi_ws import (MimiWsState, MimiRooms, handle_mimi_socket,
                              handle_room_send, handle_room_recv)
        mimi, mimi_params = info.get_mimi()
        state = MimiWsState(mimi, mimi_params)
        rooms = MimiRooms(state, allowed=mcfg.get("rooms"),
                          default_room=mcfg.get("default_room"))
        if mcfg.get("recv_route"):
            # reference schema (mimi.rs): send_path/recv_path sockets, the
            # room picked by the `room_id` header (falling back to
            # default_room) — route == send_path here
            extra = [(mcfg["recv_route"],
                      lambda req: handle_room_recv(req, rooms))]
            return route, (lambda req: handle_room_send(req, rooms)), None, \
                {"type": mtype, "_extra_routes": extra}
        # native schema: tokenizer socket on the route + room sub-routes
        extra = [
            (route + "/{room}/send",
             lambda req: handle_room_send(req, rooms)),
            (route + "/{room}/recv",
             lambda req: handle_room_recv(req, rooms)),
        ]
        return route, (lambda req: handle_mimi_socket(req, state)), None, \
            {"type": mtype, "_extra_routes": extra}

    raise ValueError(f"unknown module type {mtype}")


def make_ssl_context(cert_dir: str | Path):
    """TLS termination in-process (reference: moshi-server rustls via
    axum-server; moshi-backend generates self-signed certs with rcgen,
    standalone mode).  Loads cert.pem/key.pem from `cert_dir`, generating a
    self-signed pair on first use if absent."""
    import ssl
    cert_dir = Path(cert_dir)
    cert_dir.mkdir(parents=True, exist_ok=True)
    cert, key = cert_dir / "cert.pem", cert_dir / "key.pem"
    if not cert.exists() or not key.exists():
        import subprocess
        subprocess.run(
            ["openssl", "req", "-x509", "-newkey", "rsa:2048", "-nodes",
             "-keyout", str(key), "-out", str(cert), "-days", "365",
             "-subj", "/CN=localhost"],
            check=True, capture_output=True)
        print(f"[info] generated self-signed TLS cert in {cert_dir}")
    ctx = ssl.SSLContext(ssl.PROTOCOL_TLS_SERVER)
    ctx.load_cert_chain(str(cert), str(key))
    return ctx


def build_app(cfg: dict, drain_timeout: float = 360.0):
    """Assemble the worker aiohttp app from a parsed TOML config: module
    routes, auth middleware, /metrics, /api/*, static dir, and graceful
    drain (`app["start_drain"]()` or authed POST /api/drain: new sessions
    get 503, the process exits once open sessions finish or the timeout
    passes — zero-downtime deploys behind the fleet dispatcher)."""
    from aiohttp import web

    authorized = set(cfg.get("authorized_ids", []))
    draining = {"on": False}

    @web.middleware
    async def auth_middleware(request, handler):
        if authorized and not request.path.startswith(("/metrics", "/api/build_info")):
            key = (request.headers.get("kyutai-api-key")
                   or request.query.get("auth_id"))
            if key not in authorized:
                return web.Response(status=401, text="unauthorized")
        return await handler(request)

    module_routes: list[str] = []

    @web.middleware
    async def drain_middleware(request, handler):
        # during a drain module routes refuse new sessions; observability
        # endpoints (/metrics, /api/build_info, ...) stay open
        if draining["on"] and any(request.path.startswith(r)
                                  for r in module_routes):
            return web.Response(status=503, text="draining")
        return await handler(request)

    middlewares = ([auth_middleware] if authorized else []) + [drain_middleware]
    app = web.Application(middlewares=middlewares)

    from .metrics import OPEN_CHANNELS, REGISTRY
    drain_gauge = REGISTRY.gauge(
        "draining", "1 while the worker refuses new sessions")

    def start_drain():
        if draining["on"]:
            return
        draining["on"] = True
        drain_gauge.inc()  # fleet dispatchers stop assigning here
        print(f"[info] draining: no new sessions; exiting when idle "
              f"(open={OPEN_CHANNELS.value:g}, timeout={drain_timeout}s)",
              flush=True)

        async def watcher():
            import signal
            import time as _time
            t0 = _time.time()
            while (OPEN_CHANNELS.value > 0
                   and _time.time() - t0 < drain_timeout):
                await asyncio.sleep(1.0)
            print("[info] drained; shutting down", flush=True)
            signal.raise_signal(signal.SIGINT)  # run_app cleans up

        asyncio.ensure_future(watcher())

    app["start_drain"] = start_drain
    app["draining"] = draining

    async def drain_handler(_):
        start_drain()
        return web.json_response({"draining": True,
                                  "open": OPEN_CHANNELS.value})

    app.router.add_post("/api/drain", drain_handler)
    modules_info = {}
    startups = []
    for i, (name, mcfg) in enumerate(cfg.get("modules", {}).items()):
        route, handler, startup, minfo = build_module(name, mcfg, seed=i)
        if minfo["type"] == "py_post":
            app.router.add_post(route, handler)
        else:
            app.router.add_get(route, handler)
        for extra_route, extra_handler in minfo.pop("_extra_routes", []):
            app.router.add_get(extra_route, extra_handler)
        modules_info[name] = {**minfo, "route": route}
        module_routes.append(route)
        if startup is not None:
            startups.append(startup)
        print(f"[info] mounted {name} ({minfo['type']}) at {route}")

    async def metrics_handler(_):
        return web.Response(text=REGISTRY.expose(), content_type="text/plain")

    async def build_info(_):
        import subprocess
        try:
            rev = subprocess.check_output(["git", "rev-parse", "HEAD"],
                                          text=True).strip()
        except Exception:
            rev = "unknown"
        return web.json_response({"build_git_revision": rev,
                                  "framework": "moshi_tpu"})

    async def modules_handler(_):
        return web.json_response(modules_info)

    app.router.add_get("/metrics", metrics_handler)
    app.router.add_get("/api/build_info", build_info)
    app.router.add_get("/api/modules_info", modules_handler)

    static_dir = cfg.get("static_dir")
    if static_dir and not Path(static_dir).is_dir():
        print(f"[warn] static_dir {static_dir!r} does not exist; "
              "serving without a web UI")
        static_dir = None
    if static_dir:
        import os

        async def handle_root(_):
            return web.FileResponse(os.path.join(static_dir, "index.html"))

        app.router.add_get("/", handle_root)
        app.router.add_static("/", path=static_dir, follow_symlinks=True,
                              name="static")

    async def on_startup(app):
        app["tasks"] = [await s() for s in startups]

    app.on_startup.append(on_startup)
    return app


def main():
    from aiohttp import web

    parser = argparse.ArgumentParser()
    parser.add_argument("--config", required=True)
    parser.add_argument("--host", default="localhost")
    parser.add_argument("--port", type=int, default=8998)
    parser.add_argument("--ssl", metavar="CERT_DIR", default=None,
                        help="serve https/wss; generates a self-signed cert "
                             "in CERT_DIR if none present")
    parser.add_argument("--drain-timeout", type=float, default=360.0,
                        help="max seconds to wait for open sessions after a "
                             "drain (SIGTERM or POST /api/drain)")
    args = parser.parse_args()

    cfg = tomllib.loads(Path(args.config).read_text())
    app = build_app(cfg, drain_timeout=args.drain_timeout)

    async def install_sigterm(app_):
        import signal
        loop = asyncio.get_running_loop()
        try:
            # SIGTERM (docker stop / rolling deploy) drains instead of
            # killing mid-session; aiohttp's default handler is replaced
            loop.add_signal_handler(signal.SIGTERM, app_["start_drain"])
        except (NotImplementedError, RuntimeError):
            pass

    app.on_startup.append(install_sigterm)
    ssl_context = make_ssl_context(args.ssl) if args.ssl else None
    web.run_app(app, host=args.host, port=args.port, ssl_context=ssl_context)


if __name__ == "__main__":
    main()
