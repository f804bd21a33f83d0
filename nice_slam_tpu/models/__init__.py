"""Functional decoder models (pytree params + pure apply functions).

TPU re-design of the reference's ConvONet-style decoders
(src/conv_onet/models/decoder.py): no nn.Module state — parameters are
nested dicts, specs are hashable dataclasses usable as jit static args.
"""

from nice_slam_tpu.models.decoders import (
    DecoderSpec,
    ModelSpec,
    nice_model_spec,
    imap_model_spec,
    init_decoder,
    init_model,
    apply_mlp,
    apply_mlp_no_xyz,
    model_apply,
    STAGES,
)
from nice_slam_tpu.models.embedding import (
    init_fourier_embedding,
    apply_embedding,
    embedding_dim,
)
