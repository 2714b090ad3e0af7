"""Tk frontend for the Neural Photo Editor (reference `NPE.py:370-425`).

All editing logic lives in `EditSession`; this module is pure presentation:
a 256x256 output canvas (64x64 image at 4x), a 160x160 latent canvas
(10x10 cells at 16 px), color-gradient bar, brush-size and color sliders,
and the Sample/Reset/Update/Infer/Col buttons.
"""

import numpy as np

from npe_tpu.editor.engine import EditSession
from npe_tpu.utils.ranges import to_tanh


def rgb(r, g, b):
    return "#%02x%02x%02x" % (r, g, b)


def rb(i):
    """Bidirectional red/blue scale for signed latent values (`NPE.py:32-34`)."""
    i = int(i)
    return rgb(
        255 + max(int(i * int(i < 0)), -255),
        255 - min(abs(int(i)), 255),
        255 - min(int(i * int(i > 0)), 255),
    )


def run(config="IAN_simple", weights_path=None, valid_npz="CelebAValid.npz", scale=4, res=16):
    from tkinter import (
        HORIZONTAL,
        LEFT,
        NW,
        TOP,
        Button,
        Canvas,
        Entry,
        Frame,
        IntVar,
        Scale,
        Tk,
    )
    from tkinter.colorchooser import askcolor

    from PIL import Image, ImageTk

    session = EditSession(config=config, weights_path=weights_path)
    dim = session.dim
    h, w = session.module.cfg["dims"]

    try:
        valid = np.load(valid_npz)["arr_0"]
    except (FileNotFoundError, KeyError):
        valid = None

    master = Tk()
    master.title("Neural Photo Editor (TPU)")

    color = IntVar()
    color.set(0)
    d = IntVar()
    d.set(12)
    mycol = [0, 0, 0]
    painted_rects = []
    rects = np.zeros(dim, dtype=int)
    r_canvas = np.zeros((res * dim[0], res * dim[1]), np.float32)
    bd = 2

    f = Frame(master)
    f.pack(side=TOP)
    output = Canvas(f, name="output", width=w * scale, height=h * scale)
    pixel_rect = output.create_rectangle(0, 0, scale, scale, outline="yellow")
    output.pack()

    f2 = Frame(master, width=res * dim[0], height=dim[1] * 10)
    f2.pack(side=TOP)
    latent_canvas = Canvas(f2, name="canvas", width=res * dim[0], height=res * dim[1])
    for i in range(dim[0]):
        for j in range(dim[1]):
            rects[i, j] = latent_canvas.create_rectangle(
                j * res, i * res, (j + 1) * res, (i + 1) * res, fill=rb(0), outline=rb(0)
            )
    latent_canvas.pack()

    def update_photo(data=None):
        if data is None:
            data = session.decode_current()
            data = np.uint8(np.clip(255.0 * (data + 1) / 2.0, 0, 255))
        data = np.repeat(np.repeat(np.uint8(data), scale, 1), scale, 2)
        im = Image.fromarray(data.transpose(1, 2, 0), mode="RGB")
        output.photo = ImageTk.PhotoImage(image=im)
        output.create_image(0, 0, image=output.photo, anchor=NW)
        output.tag_raise(pixel_rect)

    def update_canvas():
        nonlocal painted_rects
        for p in painted_rects:
            latent_canvas.delete(p)
        painted_rects = []
        zg = session.Z_grid
        for i in range(dim[0]):
            for j in range(dim[1]):
                latent_canvas.itemconfig(
                    int(rects[i, j]), fill=rb(255 * zg[i, j]), outline=rb(255 * zg[i, j])
                )

    def move_mouse(event):
        x, y = event.x // scale, event.y // scale
        bwidth = (d.get() // scale) + 1
        xmin = max(min(x - bwidth // 2, w - bwidth), 0)
        ymin = max(min(y - bwidth // 2, h - bwidth), 0)
        output.coords(
            pixel_rect, scale * xmin, scale * ymin, scale * (xmin + bwidth), scale * (ymin + bwidth)
        )
        output.tag_raise(pixel_rect)
        output.itemconfig(pixel_rect, outline=rgb(*[int(c) for c in mycol]))

    def paint(event):
        move_mouse(event)
        x1, y1, x2, y2 = [int(c) // scale for c in output.coords(pixel_rect)]
        session.paint_stroke(x1, y1, x2, y2, mycol)
        update_canvas()
        update_photo(session.im_uint8())

    def paint_latents(event):
        x1, y1 = event.x - d.get(), event.y - d.get()
        x2, y2 = event.x + d.get(), event.y + d.get()
        painted_rects.append(
            event.widget.create_rectangle(
                x1, y1, x2, y2, fill=rb(color.get()), outline=rb(color.get())
            )
        )
        r_canvas[
            max(y1 - bd, 0) : min(y2 - bd, r_canvas.shape[0]),
            max(x1 - bd, 0) : min(x2 - bd, r_canvas.shape[1]),
        ] = color.get() / 255.0
        # Per-cell mean pooling of the painted canvas (`NPE.py:289-291`).
        zg = r_canvas.reshape(dim[0], res, dim[1], res).mean(axis=(1, 3))
        session.set_latents(zg)
        update_canvas()
        update_photo(session.im_uint8())

    def scroll(event):
        x1, y1, x2, y2 = [int(c) // scale for c in output.coords(pixel_rect)]
        session.scroll_patch(x1, y1, x2, y2, np.sign(event.delta))
        update_canvas()
        update_photo()

    def sample():
        session.sample(np.random.randint(1 << 31))
        update_canvas()
        update_photo()

    def reset():
        session.reset()
        update_canvas()
        update_photo(session.im_uint8())

    def update_gim():
        session.update_gim()
        update_canvas()
        update_photo(session.im_uint8())

    def infer():
        if valid is None:
            print("no validation set available")
            return
        try:
            val = int(myentry.get())
        except ValueError:
            print("No input")
            val = 420
        session.infer(to_tanh(np.float32(valid[val])))
        update_canvas()
        update_photo(session.im_uint8())

    def update_brush(event):
        brush.create_rectangle(0, 0, 25, 25, fill=rgb(255, 255, 255), outline=rgb(255, 255, 255))
        brush.create_rectangle(
            int(12.5 - d.get() / 4.0),
            int(12.5 - d.get() / 4.0),
            int(12.5 + d.get() / 4.0),
            int(12.5 + d.get() / 4.0),
            fill=rb(color.get()),
            outline=rb(color.get()),
        )

    def get_color():
        col = askcolor(tuple(int(c) for c in mycol))
        if col[0] is not None:
            mycol[:] = col[0]

    master.bind("<MouseWheel>", scroll)
    output.bind("<Motion>", move_mouse)
    output.bind("<B1-Motion>", paint)
    latent_canvas.bind("<B1-Motion>", paint_latents)

    gradient = Canvas(master, width=400, height=20)
    gradient.pack(side=TOP)
    for j in range(-200, 200):
        gradient.create_rectangle(
            j * 255 / 200 + 200, 0, j * 255 / 200 + 201, 20, fill=rb(j * 255 / 200), outline=rb(j * 255 / 200)
        )
    Scale(
        master, from_=-255, to=255, length=400, variable=color, orient=HORIZONTAL, showvalue=0, command=update_brush
    ).pack(side=TOP)

    f3 = Frame(master)
    Button(f3, text="Sample", command=sample).pack(side=LEFT)
    Button(f3, text="Reset", command=reset).pack(side=LEFT)
    Button(f3, text="Update", command=update_gim).pack(side=LEFT)
    brush = Canvas(f3, width=25, height=25)
    Scale(
        f3, from_=0, to=64, length=100, width=25, variable=d, orient=HORIZONTAL, showvalue=0, command=update_brush
    ).pack(side=LEFT)
    brush.pack(side=LEFT)
    Button(f3, text="Infer", command=infer).pack(side=LEFT)
    Button(f3, text="Col", command=get_color).pack(side=LEFT)
    myentry = Entry(f3)
    myentry.pack(side=LEFT)
    f3.pack(side=TOP)

    print("Running")
    if valid is not None:
        infer()
    else:
        sample()
    master.mainloop()


if __name__ == "__main__":
    run()
