"""VGG demo (reference src/main_demo_vgg.cpp): takes an extra network
config file of channel counts and M/A pool markers, or a built-in
--model vgg11/vgg16.
"""

from .runner import base_arg_parser, finish_args, run, build_model
from ..nn import models as model_zoo



def main():
    ap = base_arg_parser("zkcnn-tpu VGG demo")
    ap.add_argument("--model", default="vgg11", choices=["vgg11", "vgg16"])
    ap.add_argument("--network", help="network config file "
                    "(reference src/models.cpp:18-35 format)")
    args = finish_args(ap.parse_args())
    if args.network:
        with open(args.network) as f:
            tokens = f.read().split()
        nn = model_zoo.vgg(32, 32, 3, args.pic_cnt, tokens)
        psize, ksize = 32, 3
        name = "vgg (config)"
        mid = "vgg"
    else:
        nn, psize, ksize = build_model(args.model, args)
        name = f"{args.model} (relu)"
        mid = args.model
    run(nn, args, name, psize, ksize, model_id=mid)


if __name__ == "__main__":
    main()
