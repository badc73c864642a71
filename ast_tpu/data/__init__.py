from ast_tpu.data.buckets import create_buckets, buckets_main
from ast_tpu.data.dataloader import FisherDataLoader, GlobalPhoneDataLoader, make_dataloader

__all__ = [
    "create_buckets",
    "buckets_main",
    "FisherDataLoader",
    "GlobalPhoneDataLoader",
    "make_dataloader",
]
