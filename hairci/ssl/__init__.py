from hairci.ssl.base import RECIPES, build_recipe, register_recipe, backbone_features
from hairci.ssl import simclr  # noqa: F401  (registers "simclr")
from hairci.ssl import sham  # noqa: F401  (registers "SHAM")
