/* dump a2_Render output (offline substate render path) */
#include <stdio.h>
#include <stdlib.h>
#include "audiality2.h"
#include "a2_stream.h"
#include "a2_waves.h"

int main(int argc, char *argv[])
{
    /* render argv[1]:Song via a2_Render into a wave, dump its data */
    A2_config *cfg = a2_OpenConfig(44100, 4096, 1, A2_TIMESTAMP | A2_AUTOCLOSE);
    a2_AddDriver(cfg, a2_NewDriver(A2_AUDIODRIVER, "buffer"));
    A2_interface *iface = a2_Open(cfg);
    A2_handle module = a2_Load(iface, argv[1], 0);
    A2_handle prog = a2_Get(iface, module, "Song");
    unsigned length = atoi(argv[2]);
    /* target: a wave of 'length' frames, streamed through a2_Render */
    A2_handle wh = a2_NewWave(iface, A2_WWAVE, 0, 0);
    /* Actually simpler: render to a wave via a2_RenderWave?  That is
       NOTIMPLEMENTED offline.  Use a stream on a new wave. */
    (void)wh;
    A2_handle wav = a2_NewWave(iface, A2_WWAVE, length, 0);
    if(wav < 0) { fprintf(stderr, "newwave: %s\n", a2_ErrorString(-wav)); return 1; }
    A2_handle sh = a2_OpenStream(iface, wav, 0, 0, 0);
    if(sh < 0) { fprintf(stderr, "stream: %s\n", a2_ErrorString(-sh)); return 1; }
    int res = a2_Render(iface, sh, 44100, length, NULL, prog, 0, NULL);
    if(res < 0) { fprintf(stderr, "render: %s\n", a2_ErrorString(-res)); return 1; }
    a2_Flush(iface, sh);
    a2_Release(iface, sh);
    A2_wave *w = a2_GetWave(iface, wav);
    FILE *f = fopen(argv[3], "wb");
    /* wave data is int16 (converted) */
    fwrite(w->d.wave.data[0] + 1, 2, length, f);
    fclose(f);
    printf("rendered %d\n", res);
    return 0;
}
