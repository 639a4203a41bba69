"""LeNet demo (reference src/main_demo_lenet.cpp): argv-compatible
`input config output [pic_cnt]`, plus --synthetic for the missing
upstream demo data and --model to run smaller circuits.
"""

from .runner import base_arg_parser, finish_args, run, build_model


def main():
    ap = base_arg_parser("zkcnn-tpu LeNet demo")
    ap.add_argument("--model", default="lenet",
                    choices=["lenet", "lenet-cifar", "ccnn"])
    args = finish_args(ap.parse_args())
    nn, psize, ksize = build_model(args.model, args)
    run(nn, args, f"{args.model} (relu)", psize, ksize,
        model_id=args.model)


if __name__ == "__main__":
    main()
