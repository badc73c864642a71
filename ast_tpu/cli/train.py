"""Training CLI: ``python train.py -m <experiment_dir> -e <epochs>``.

Mirrors the reference epoch driver exactly (reference: train.py:17-77):
per epoch — train, greedy-decode dev, BLEU, append ``train.log``
(``epoch, loss``) and ``dev.log`` (``epoch, bleu``), checkpoint every
``iters_save`` epochs and at the end; auto-resume continues from
``max_epoch + 1``.
"""

import argparse
import os
import signal

import jax

from ast_tpu.eval.bleu import Eval
from ast_tpu.train.trainer import NN, PreemptedError


def _install_preempt_handler(nn):
    """SIGTERM (cluster preemption) => snapshot at the next batch
    boundary and exit cleanly; the next run resumes mid-epoch."""
    def handler(signum, frame):
        print("SIGTERM received: snapshotting at next batch boundary",
              flush=True)
        nn.request_preempt()

    try:
        signal.signal(signal.SIGTERM, handler)
    except ValueError:
        pass  # not the main thread (e.g. under a test runner)


def main(argv=None):
    parser = argparse.ArgumentParser(description="Train and evaluate model")
    parser.add_argument("-m", "--cfg_path", required=True,
                        help="path for model config")
    parser.add_argument("-e", "--epochs", required=True, help="num epochs")
    parser.add_argument("--profile", default=None, metavar="LOGDIR",
                        help="capture a jax.profiler trace of the first "
                             "training epoch into LOGDIR")
    args = parser.parse_args(argv)

    cfg_path = args.cfg_path
    epochs = int(args.epochs)
    print(f"number of epochs={epochs:d}")

    nn = NN(cfg_path)
    _install_preempt_handler(nn)
    train_key = nn.cfg.train["train_set"]
    dev_key = nn.cfg.train["dev_set"]
    iters_save = nn.cfg.train["iters_save"]

    refs_path = os.path.join(nn.cfg.train["data"]["refs_path"], dev_key)
    metrics = Eval(refs_path, nn.cfg.train["data"]["n_evals"])

    start_epoch = nn.max_epoch + 1
    max_epoch = start_epoch + epochs
    for epoch in range(start_epoch, max_epoch):
        print("-" * 80)
        print(f"Experiment: {cfg_path:s} epoch: {epoch:d}")
        print("-" * 80)

        try:
            if args.profile and epoch == start_epoch:
                from ast_tpu.utils.profiling import profile_trace
                with profile_trace(args.profile):
                    epoch_loss = nn.train_epoch(train_key, epoch=epoch)
            else:
                epoch_loss = nn.train_epoch(train_key, epoch=epoch)
        except PreemptedError as e:
            print(str(e))
            print("exiting cleanly; rerun to resume mid-epoch")
            return
        # log/checkpoint writes belong to process 0 (multi-host runs may
        # share the experiment dir); predict() all-gathers so BLEU is
        # computed over the full dev split on every host
        is_p0 = jax.process_index() == 0
        if is_p0:
            with open(nn.train_log, mode="a") as train_log:
                train_log.write(f"{epoch:d}, {epoch_loss:.4f}\n")

        # a SIGTERM that lands between the batch loop and the epoch's
        # eval phases would otherwise run the full dev decode + BLEU and
        # only stop at the next epoch's batch loop (or be lost entirely
        # after the final epoch) — check at each phase boundary, and
        # checkpoint the finished epoch before exiting: with the default
        # config (no in-epoch snapshots) nothing else persists it, and
        # the periodic nn.save below may not be due this epoch
        if nn.preempt_pending():
            print("preempted after training phase; saving epoch "
                  "checkpoint and exiting cleanly")
            nn.save(epoch)
            return

        preds = nn.predict(dev_key)
        hyps = nn.data_loader.get_hyps(preds)
        bleu = metrics.calc_bleu(hyps) * 100

        if is_p0:
            with open(nn.dev_log, mode="a") as dev_log:
                dev_log.write(f"{epoch:d}, {bleu:.2f}\n")
        print(f"BLEU = {bleu:.2f}")
        print(f"train throughput = {nn.timer.items_per_sec:.1f} utts/sec")
        nn.timer.reset()
        print("-" * 80)

        saved = (epoch % iters_save == 0) or (epoch == max_epoch - 1)
        if saved:
            print("Saving model")
            nn.save(epoch)
            print("Finished saving model")

        if nn.preempt_pending():
            if not saved:
                nn.save(epoch)  # don't lose the just-trained epoch
            print("preempted after eval phase; exiting cleanly")
            return


if __name__ == "__main__":
    main()
