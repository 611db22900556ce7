from .minconv import minconv_xor, fb_checknode_dense  # noqa: F401
