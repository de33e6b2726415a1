#!/usr/bin/env python
"""Segmentation task CLI (parity surface of
`/root/reference/script/task/semantic_segmentation.py`): YAML config →
DeepLabv3 over splittable backbone → train → mIoU eval with data-size
analysis at batch 1."""
import argparse
import logging
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from sc2bench_tpu.config import load_config  # noqa: E402
from sc2bench_tpu.train.seg_engine import SegmentationEngine  # noqa: E402

logger = logging.getLogger('sc2bench_tpu')


def get_argparser():
    parser = argparse.ArgumentParser(description='TPU-native supervised '
                                     'compression: semantic segmentation')
    parser.add_argument('--config', required=True)
    parser.add_argument('--json', help='json string to overwrite config')
    parser.add_argument('--run_log')
    parser.add_argument('--seed', type=int, default=42)
    parser.add_argument('--dst_ckpt')
    parser.add_argument('--world_size', type=int, default=1)
    parser.add_argument('-test_only', action='store_true')
    parser.add_argument('-student_only', action='store_true',
                        help='skip the teacher-anchor eval')
    parser.add_argument('-adjust_lr', action='store_true',
                        help='multiply training lr by the data-parallel '
                        'world size (reference -adjust_lr)')
    parser.add_argument('-no_dp_eval', action='store_true',
                        help='disable data-parallel eval (reference '
                        '-no_dp_eval; seg eval is batch-1 per the data-size '
                        'protocol, so this only pins eval to one device)')
    parser.add_argument('-log_config', action='store_true',
                        help='log the resolved config (reference -log_config)')
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
    engine = SegmentationEngine(
        config, image_size=config.get('image_size', (512, 512)),
        num_classes=config.get('num_classes', 21))
    if not args.test_only:
        best = engine.train(dst_ckpt=args.dst_ckpt)
        logger.info('best val mIoU: %s', best)
    result, summaries = engine.test()
    logger.info('test result: %s', result)
    for s in summaries:
        logger.info('analysis: %s', s)
    if not args.student_only and engine.wrapper is None \
            and engine.teacher_module is not None:
        loader_cfg = config.get('test', {}).get('test_data_loader')
        if loader_cfg:
            t_result = engine.evaluate(engine.build_loader(loader_cfg),
                                       use_teacher=True)
            logger.info('teacher result: %s', t_result)
    return result


if __name__ == '__main__':
    main(get_argparser().parse_args())
