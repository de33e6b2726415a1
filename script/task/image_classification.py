#!/usr/bin/env python
"""Classification task CLI.

Parity surface of `/root/reference/script/task/image_classification.py`:
argparse → YAML config (+ `--json` deep override) → build teacher/student →
multi-stage (distillation) training with `epoch_to_update` → `update()` →
test with data-size analysis at batch 1.

TPU notes: runs single-host by default; multi-host via
`jax.distributed.initialize()` when `--world_size` > 1 (SURVEY.md §5.8).
"""
import argparse
import logging
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from sc2bench_tpu.config import load_config  # noqa: E402
from sc2bench_tpu.registry import import_dependencies  # noqa: E402
from sc2bench_tpu.train.engine import ClassificationEngine  # noqa: E402

logger = logging.getLogger('sc2bench_tpu')


def get_argparser():
    parser = argparse.ArgumentParser(description='TPU-native supervised '
                                     'compression: image classification')
    parser.add_argument('--config', required=True, help='yaml config path')
    parser.add_argument('--json', help='json string to overwrite config')
    parser.add_argument('--run_log', help='log file path')
    parser.add_argument('--seed', type=int, default=42)
    parser.add_argument('--dst_ckpt', help='checkpoint output path')
    parser.add_argument('--world_size', type=int, default=1)
    parser.add_argument('-test_only', action='store_true',
                        help='only test the final model')
    parser.add_argument('-student_only', action='store_true',
                        help='test the student model only')
    parser.add_argument('-resume', action='store_true',
                        help='resume training from dst_ckpt train state')
    parser.add_argument('-adjust_lr', action='store_true',
                        help='multiply training lr by the data-parallel '
                        'world size (reference -adjust_lr)')
    parser.add_argument('-no_dp_eval', action='store_true',
                        help='disable sharding eval batches over the device '
                        'mesh (reference -no_dp_eval; the batch-1 data-size '
                        'protocol is single-device regardless)')
    parser.add_argument('-log_config', action='store_true',
                        help='log the resolved config (reference -log_config)')
    parser.add_argument('--profile_dir',
                        help='capture a jax.profiler trace of the test phase')
    return parser


def main(args):
    handlers = [logging.StreamHandler()]
    if args.run_log:
        Path(args.run_log).parent.mkdir(parents=True, exist_ok=True)
        handlers.append(logging.FileHandler(args.run_log))
    logging.basicConfig(level=logging.INFO, handlers=handlers)
    if args.world_size > 1:
        import jax
        jax.distributed.initialize()
    config = load_config(args.config, args.json)
    if args.adjust_lr:
        config['adjust_lr'] = True
    if args.no_dp_eval:
        config['no_dp_eval'] = True
    if args.log_config:
        logger.info('config: %s', config)
    import_dependencies(config.get('dependencies'))
    engine = ClassificationEngine(
        config, image_size=config.get('image_size', (224, 224)),
        seed=args.seed)
    if not args.test_only:
        best = engine.train(dst_ckpt=args.dst_ckpt, resume=args.resume)
        logger.info('best validation acc1: %s', best)
    if args.profile_dir:
        from sc2bench_tpu.utils.profiling import trace
        with trace(args.profile_dir):
            result, summaries = engine.test()
    else:
        result, summaries = engine.test()
    logger.info('test result: %s', result)
    for s in summaries:
        logger.info('analysis: %s', s)
    if not args.student_only \
            and getattr(engine, 'teacher_module', None) is not None:
        # reference also scores the teacher anchor unless -student_only
        # (`image_classification.py:240-242`)
        test_cfg = config.get('test', {}).get('test_data_loader')
        if test_cfg:
            engine.evaluate_teacher(engine.build_loader(test_cfg))
    return result


if __name__ == '__main__':
    main(get_argparser().parse_args())
