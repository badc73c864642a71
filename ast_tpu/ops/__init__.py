from ast_tpu.ops.lstm import init_lstm_params, lstm_step
from ast_tpu.ops.cnn import init_conv_params, conv_frontend
from ast_tpu.ops.attention import luong_attention

__all__ = [
    "init_lstm_params",
    "lstm_step",
    "init_conv_params",
    "conv_frontend",
    "luong_attention",
]
