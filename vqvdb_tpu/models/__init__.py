from vqvdb_tpu.models.vqvae import (  # noqa: F401
    VQVAEParams,
    init_vqvae_params,
    encoder_apply,
    decoder_apply,
    encode_to_indices,
    decode_from_indices,
    vqvae_forward,
)
