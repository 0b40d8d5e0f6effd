"""Tkinter interactive demo app (reference: core/interactive_demo/app.py:19-404,
compacted).

Left-click = positive, right-click = negative; buttons for undo / reset /
finish object / save mask. Uses the shared InteractiveController, so all model
work runs through the compiled TPU predictor.
"""

from __future__ import annotations

import tkinter as tk
from pathlib import Path
from tkinter import filedialog, ttk

import cv2
import numpy as np
from PIL import Image, ImageTk

from isegprobe_tpu.interactive_demo.controller import InteractiveController


class InteractiveDemoApp(ttk.Frame):
    def __init__(self, master, predictor_factory, prob_thresh: float = 0.5):
        super().__init__(master)
        self.master = master
        master.title("iSegProbe-TPU interactive demo")
        self.pack(fill="both", expand=True)

        self.controller = InteractiveController(
            predictor_factory,
            update_image_callback=self._update_image,
            prob_thresh=prob_thresh,
        )
        self._photo = None

        self._add_menu()
        self._add_canvas()
        self._add_buttons()

    # -- UI ---------------------------------------------------------------

    def _add_menu(self):
        menubar = tk.Frame(self, bd=1)
        menubar.pack(side="top", fill="x")
        tk.Button(menubar, text="Load image", command=self._load_image).pack(
            side="left"
        )
        tk.Button(menubar, text="Save mask", command=self._save_mask).pack(
            side="left"
        )
        tk.Button(menubar, text="Exit", command=self.master.quit).pack(side="left")

    def _add_canvas(self):
        self.canvas = tk.Canvas(self, width=800, height=600, bg="#404040")
        self.canvas.pack(side="top", fill="both", expand=True)
        self.canvas.bind("<Button-1>", lambda e: self._click(e, True))
        self.canvas.bind("<Button-3>", lambda e: self._click(e, False))

    def _add_buttons(self):
        bar = tk.Frame(self, bd=1)
        bar.pack(side="bottom", fill="x")
        tk.Button(bar, text="Undo click",
                  command=self.controller.undo_click).pack(side="left")
        tk.Button(bar, text="Reset clicks",
                  command=self.controller.reset_last_object).pack(side="left")
        tk.Button(bar, text="Finish object",
                  command=self.controller.finish_object).pack(side="left")

    # -- actions ------------------------------------------------------------

    def _load_image(self):
        path = filedialog.askopenfilename(
            filetypes=[("Images", "*.jpg *.jpeg *.png *.bmp")]
        )
        if not path:
            return
        image = cv2.cvtColor(cv2.imread(path), cv2.COLOR_BGR2RGB)
        self.controller.set_image(image)

    def _save_mask(self):
        mask = self.controller.result_mask
        if mask is None:
            return
        path = filedialog.asksaveasfilename(defaultextension=".png")
        if not path:
            return
        if mask.max() < 256:
            mask = mask.astype(np.uint8)
            mask *= 255 // max(1, mask.max())
        cv2.imwrite(path, mask)

    def _click(self, event, is_positive: bool):
        if self.controller.image is None:
            return
        self.controller.add_click(event.x, event.y, is_positive)

    def _update_image(self, reset_canvas: bool = False):
        vis = self.controller.get_visualization(alpha_blend=0.5, click_radius=3)
        if vis is None:
            return
        self._photo = ImageTk.PhotoImage(Image.fromarray(vis.astype(np.uint8)))
        self.canvas.delete("all")
        self.canvas.create_image(0, 0, image=self._photo, anchor="nw")


def run_app(predictor_factory, prob_thresh: float = 0.5):
    root = tk.Tk()
    root.minsize(960, 720)
    app = InteractiveDemoApp(root, predictor_factory, prob_thresh)
    root.deiconify()
    app.mainloop()
