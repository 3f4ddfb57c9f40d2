from .braai import (BraaiD6, init_braai, load_braai, save_braai, rb_scores,
                    train_step)

__all__ = ['BraaiD6', 'init_braai', 'load_braai', 'save_braai', 'rb_scores',
           'train_step']
