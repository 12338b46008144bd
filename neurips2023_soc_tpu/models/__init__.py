from .soc import SOC
from .video_swin import VideoSwinBackbone, build_video_swin, SWIN_CONFIGS
from .text_encoder import RobertaEncoder, build_tokenizer, ROBERTA_CONFIGS
from .voc import VOC
from .deformable_transformer import DeformableTransformer
from .segmentation import FPNSpatialDecoder, dynamic_mask_with_coords


def build_model(config):
    """build_model(config) -> SOC module (reference models/__init__.py:1-5).

    The criterion/postprocessor builders live in losses/ and
    models/postprocessing.py and are constructed by the trainers.
    """
    dt = config.DeformTransformer
    voc = config.VOC
    import jax.numpy as jnp

    dtype = jnp.bfloat16 if config.get("compute_dtype", "float32") == "bfloat16" else jnp.float32
    if dt.get("two_stage", False):
        # reference quirk, reproduced (COMPONENTS.md bug register): enc-stage
        # class/bbox heads get NO loss (enc_outputs are dropped by SOC), so
        # top-k proposal selection runs on effectively untrained heads
        print("WARNING: two_stage=true — encoder proposal heads receive no "
              "supervision (reference soc.py:288 drops enc_outputs); expect "
              "untrained top-k proposal selection if you train this config")
    return SOC(
        backbone_name=config.backbone,
        num_classes=config.num_classes,
        d_model=dt["d_model"],
        num_queries=dt["num_queries"],
        num_feature_levels=dt["num_feature_levels"],
        nheads=dt["nheads"],
        enc_layers=dt["enc_layers"],
        dec_layers=dt["dec_layers"],
        dim_feedforward=dt["dim_feedforward"],
        dropout=dt["dropout"],
        enc_n_points=dt["enc_n_points"],
        dec_n_points=dt["dec_n_points"],
        with_box_refine=config.with_box_refine,
        two_stage=dt.get("two_stage", False),
        two_stage_num_proposals=dt.get("two_stage_num_proposals", 300),
        rel_coord=config.rel_coord,
        mask_kernels_dim=config.mask_kernels_dim,
        controller_layers=config.controller_layers,
        dynamic_mask_channels=config.dynamic_mask_channels,
        voc_window_size=voc["window_size"],
        voc_enc_layers=voc["enc_layers"],
        voc_dec_layers=voc["dec_layers"],
        text_encoder_type=config.text_encoder_type,
        freeze_text_encoder=config.freeze_text_encoder,
        vl_loss=config.vl_loss,
        aux_loss=config.aux_loss,
        use_remat=config.get("use_checkpoint", False),
        msda_impl=config.get("msda_impl", "auto"),
        swin_attn_impl=config.get("swin_attn_impl", "xla"),
        dtype=dtype,
    )
